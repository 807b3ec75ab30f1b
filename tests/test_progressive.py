"""Progressive StyleGAN tests (legacy gen-1 capability): shapes at each
resolution, fade-in blending, WGAN-GP/R1 train steps, EMA, style-MLP lr."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.models.progressive import (
    ProgressiveDiscriminator,
    StyledGenerator,
)
from sba_gan_tpu.train.progressive import ProgressiveTrainer

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')


@pytest.fixture(scope="module")
def trainer():
    return ProgressiveTrainer(
        z_dim=8, w_dim=16, max_resolution=16, fmap_max=16,
        loss_mode="wgan-gp", embed_dim=12,
    )


@pytest.fixture(scope="module")
def state(trainer):
    return trainer.init_state(jax.random.PRNGKey(0))


def test_generator_resolutions(trainer, state):
    for step, res in [(0, 4), (1, 8), (2, 16)]:
        img = trainer.sample(
            state, jax.random.PRNGKey(1), batch=2, res_step=step,
            sent_emb=jnp.zeros((2, 12)), use_ema=False,
        )
        assert img.shape == (2, res, res, 3), (step, img.shape)
        assert np.isfinite(np.asarray(img)).all()


def test_alpha_blends_resolutions(trainer, state):
    """alpha=0 equals the upsampled lower-res RGB; alpha=1 the full path."""
    gen = trainer.generator
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    sent = jnp.zeros((2, 12))
    rngs = jax.random.PRNGKey(3)
    out0 = gen.apply({"params": state.g_params}, z, sent, 2, jnp.float32(0.0), rngs)
    out1 = gen.apply({"params": state.g_params}, z, sent, 2, jnp.float32(1.0), rngs)
    outh = gen.apply({"params": state.g_params}, z, sent, 2, jnp.float32(0.5), rngs)
    np.testing.assert_allclose(
        np.asarray(outh), 0.5 * np.asarray(out0) + 0.5 * np.asarray(out1),
        rtol=1e-4, atol=1e-5,
    )


def test_discriminator_scores(state, trainer):
    d = trainer.discriminator
    img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)),
                      jnp.float32)
    s = d.apply({"params": state.d_params}, img, 2, jnp.float32(0.7))
    assert s.shape == (4,)
    assert np.isfinite(np.asarray(s)).all()


def test_train_steps_update_and_ema(trainer, state):
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32))
    sent = jnp.zeros((4, 12))
    d_step, g_step = trainer.steps_for(1)
    s1, d_loss = d_step(state, real, sent, jnp.float32(0.5),
                        jax.random.PRNGKey(4))
    assert np.isfinite(float(d_loss))
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.d_params),
                        jax.tree.leaves(s1.d_params))
    )
    assert moved
    s2, g_loss = g_step(s1, sent, jnp.float32(0.5), jax.random.PRNGKey(5), real)
    assert np.isfinite(float(g_loss))
    # EMA shadow: 0.99*old + 0.01*new
    o = jax.tree.leaves(s1.g_params)
    n = jax.tree.leaves(s2.g_params)
    e = jax.tree.leaves(s2.g_ema)
    for a, b, c in zip(o, n, e):
        np.testing.assert_allclose(c, 0.99 * a + 0.01 * b, rtol=1e-4, atol=1e-6)


def test_r1_mode(trainer):
    tr = ProgressiveTrainer(z_dim=8, w_dim=16, max_resolution=8, fmap_max=16,
                            loss_mode="r1")
    st = tr.init_state(jax.random.PRNGKey(0))
    real = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    )
    d_step, _ = tr.steps_for(1)
    _, loss = d_step(st, real, None, jnp.float32(1.0), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_unconditional_generator():
    g = StyledGenerator(z_dim=8, w_dim=16, max_resolution=8, fmap_max=16)
    z = jnp.zeros((2, 8))
    v = g.init(jax.random.PRNGKey(0), z, None, 1, jnp.float32(1.0),
               jax.random.PRNGKey(1))
    img = g.apply(v, z, None, 1, jnp.float32(1.0), jax.random.PRNGKey(2))
    assert img.shape == (2, 8, 8, 3)


def test_d_lr_mult_default_and_with_lr(trainer, state):
    """D trains at 4x G's lr by default (Old_Code/train.py:418); with_lr
    retunes both at a phase switch (adjust_lr, train.py:76-79,178-180)."""
    assert float(state.d_opt.hyperparams["learning_rate"]) == pytest.approx(
        4.0 * float(state.g_opt[0].hyperparams["learning_rate"]))
    retuned = trainer.with_lr(state, 5e-4, 2e-3)
    assert float(retuned.g_opt[0].hyperparams["learning_rate"]) == (
        pytest.approx(5e-4))
    assert float(retuned.d_opt.hyperparams["learning_rate"]) == (
        pytest.approx(2e-3))
    # retuned state still steps
    d_step, _ = trainer.steps_for(1)
    real = jnp.zeros((2, 8, 8, 3), jnp.float32)
    s, loss = d_step(retuned, real, jnp.zeros((2, 12)), jnp.float32(1.0),
                     jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_truncation_toward_mean_style(trainer, state):
    """w_mean/style_weight truncation (generate.py:26-35) changes the
    output; style_weight=1 is a no-op."""
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 8))
    sent = jnp.zeros((2, 12))
    rng = jax.random.PRNGKey(4)
    w_mean = trainer.generator.apply(
        {"params": state.g_params}, z, sent, 0, jnp.float32(1.0), rng,
        return_w=True).mean(axis=0, keepdims=True)
    plain = trainer.generator.apply(
        {"params": state.g_params}, z, sent, 1, jnp.float32(1.0), rng)
    trunc = trainer.generator.apply(
        {"params": state.g_params}, z, sent, 1, jnp.float32(1.0), rng,
        w_mean=w_mean, style_weight=0.2)
    noop = trainer.generator.apply(
        {"params": state.g_params}, z, sent, 1, jnp.float32(1.0), rng,
        w_mean=w_mean, style_weight=1.0)
    assert np.any(np.asarray(plain) != np.asarray(trunc))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(noop),
                               rtol=1e-5, atol=1e-5)


def test_style_mixing_grid_layout(trainer, state):
    from sba_gan_tpu.progressive_generate import style_mixing_grid

    imgs = style_mixing_grid(
        trainer.generator, state.g_params, 8, 1, None, 0.7,
        jax.random.PRNGKey(5), n_source=3, n_target=2,
        sent_emb=jnp.zeros((1, 12)))
    # (n_target+1) rows x (n_source+1) cols of 8x8 images
    assert imgs.shape == ((2 + 1) * (3 + 1), 8, 8, 3)
    assert np.isfinite(imgs).all()
