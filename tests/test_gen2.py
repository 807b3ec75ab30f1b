"""Gen-2 conditional StyleGAN stack tests (SURVEY.md L8-L9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.losses.gen2 import (
    gen2_d_loss_bce,
    gen2_d_loss_wgan,
    gen2_feature_gradient_penalty,
    gen2_g_loss_wgan,
    gen2_sent_loss,
)
from sba_gan_tpu.models.gen2 import (
    Gen2Discriminator,
    Gen2Generator,
    gen2_trainable_mask,
    nf,
)
from sba_gan_tpu.train.gen2 import Gen2Trainer

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')

TINY_BERT = dict(
    vocab_size=50,
    hidden_size=16,
    num_layers=1,
    num_heads=2,
    intermediate_size=32,
    max_position=24,
    type_vocab_size=2,
    layer_norm_eps=1e-12,
)


def tiny_cfg(**gen2_overrides):
    g2 = dict(
        E_DIM=8, C_DIM=6, Z_DIM=5, W_DIM=12, A_DIM=10,
        MAX_LENGTH=7, M_LAYERS=2, RESOLUTION=16, RESOLUTION_INIT=4,
        FMAP_BASE=64, FMAP_MAX=16, WGAN=True,
    )
    g2.update(gen2_overrides)
    return cfg_from_dict({
        "GEN2": g2,
        "TRAIN": {"BATCH_SIZE": 4, "CRITIC_ITER": 2},
        "MODEL": {"INCEPTION_INPUT": 75},
    })


def make_gen(cfg, **over):
    g2 = cfg.GEN2
    kw = dict(
        resolution=g2.RESOLUTION, resolution_init=g2.RESOLUTION_INIT,
        e_dim=g2.E_DIM, c_dim=g2.C_DIM, w_dim=g2.W_DIM, a_dim=g2.A_DIM,
        m_layers=g2.M_LAYERS, fmap_base=g2.FMAP_BASE, fmap_max=g2.FMAP_MAX,
        bert_cfg=TINY_BERT,
    )
    kw.update(over)
    return Gen2Generator(**kw)


def test_nf_ladder():
    # fmap_base 4096 / fmap_max 256 (Old_Code/code/model.py:272):
    # 4x4 -> 256, 64x64 (log2=6) -> 64, 256x256 (log2=8) -> 16
    assert nf(2) == 256
    assert nf(6) == 64
    assert nf(8) == 16


@pytest.mark.parametrize("toggles", [
    dict(),
    dict(use_attn=True, use_noise=True),
    dict(use_pixel_norm=True, use_instance_norm=False),
    dict(use_truncation=True),
])
def test_generator_shapes_and_outputs(toggles):
    cfg = tiny_cfg()
    gen = make_gen(cfg, **toggles)
    tokens = jnp.ones((2, 7), jnp.int32)
    z = jnp.zeros((2, 5), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = gen.init(rng, tokens, z, rng)
    img, words, sent, mu, logvar = gen.apply(variables, tokens, z, rng)
    assert img.shape == (2, 16, 16, 3)
    assert words.shape == (2, 7, 16)   # raw BERT hidden width
    assert sent.shape == (2, 8)
    assert mu.shape == logvar.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(img)))


def test_truncation_changes_output():
    cfg = tiny_cfg()
    gen_plain = make_gen(cfg)
    gen_trunc = make_gen(cfg, use_truncation=True, truncation_psi=0.2)
    tokens = jnp.ones((2, 7), jnp.int32)
    z = jnp.full((2, 5), 0.7, jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = gen_plain.init(rng, tokens, z, rng)
    a = gen_plain.apply(variables, tokens, z, rng)[0]
    b = gen_trunc.apply(variables, tokens, z, rng)[0]
    assert np.any(np.asarray(a) != np.asarray(b))


def test_discriminator_feature_shape():
    d = Gen2Discriminator(resolution=16, resolution_init=4,
                          fmap_base=64, fmap_max=16)
    img = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), img)
    feats = d.apply(variables, img)
    assert feats.shape == (2, 4, 4, nf(2, 64, fmap_max=16))


def test_trainable_mask_freezes_bert():
    cfg = tiny_cfg()
    gen = make_gen(cfg)
    tokens = jnp.ones((2, 7), jnp.int32)
    z = jnp.zeros((2, 5), jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = gen.init(rng, tokens, z, rng)["params"]
    mask = gen2_trainable_mask(params)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    froze = [p for p, v in leaves if not v]
    trained = [p for p, v in leaves if v]
    assert froze and trained
    assert all("bert" in jax.tree_util.keystr(p) for p in froze)
    # the e_dim projection inside the text tower still trains
    assert any("bert_embedding" in jax.tree_util.keystr(p)
               and "'fc'" in jax.tree_util.keystr(p) for p in trained)


def test_sent_loss_prefers_matching_pairs():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((6, 8)).astype(np.float32)
    aligned = gen2_sent_loss(jnp.asarray(emb), jnp.asarray(emb))
    shuffled = gen2_sent_loss(jnp.asarray(emb), jnp.asarray(np.roll(emb, 1, 0)))
    assert sum(map(float, aligned)) < sum(map(float, shuffled))


def test_wgan_loss_weighting():
    one = jnp.ones((4, 1))
    # (1+1+1)/3 - (1+1)/2 + 0.5 = 1 - 1 + 0.5
    loss = gen2_d_loss_wgan(one, one, one, one, one[:3], jnp.float32(0.5))
    np.testing.assert_allclose(float(loss), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(gen2_g_loss_wgan(one, one)), -1.0)


def test_bce_loss_weighting():
    zero_logit = jnp.zeros((4, 1))  # sigmoid=0.5, BCE=log 2 for both targets
    loss = gen2_d_loss_bce(zero_logit, zero_logit, zero_logit, zero_logit,
                           zero_logit[:3])
    np.testing.assert_allclose(float(loss), 2.0 * np.log(2.0), rtol=1e-5)


def test_feature_gp_penalizes_steep_fn():
    real = jnp.zeros((2, 4, 4, 3))
    fake = jnp.ones((2, 4, 4, 3))

    def flat(x):
        return jnp.zeros((x.shape[0], 1, 1, 1))

    def steep(x):
        return 100.0 * x

    gp_flat = gen2_feature_gradient_penalty(
        flat, real, fake, jax.random.PRNGKey(0))
    gp_steep = gen2_feature_gradient_penalty(
        steep, real, fake, jax.random.PRNGKey(0))
    assert float(gp_steep) > float(gp_flat) > 0.0  # (0-1)^2 floor


def test_trainer_wgan_steps_move_params():
    cfg = tiny_cfg()
    trainer = Gen2Trainer(cfg, bert_cfg=TINY_BERT)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch=2, max_length=7)
    d_step, g_step = trainer.steps()
    real = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)), jnp.float32)
    tokens = jnp.ones((4, 7), jnp.int32)
    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    state, d_loss = d_step(state, real, tokens, rng)
    assert np.isfinite(float(d_loss))
    assert np.any(np.asarray(
        jax.tree_util.tree_leaves(state.d_params)[0]) != np.asarray(d0))
    state, g_loss = g_step(state, real, tokens, rng)
    assert np.isfinite(float(g_loss))
    # frozen BERT params must not move
    before = state.g_params["bert_embedding"]["bert"]
    state, _ = g_step(state, real, tokens, rng)
    after = state.g_params["bert_embedding"]["bert"]
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_epoch_critic_schedule():
    cfg = tiny_cfg()
    trainer = Gen2Trainer(cfg, bert_cfg=TINY_BERT)
    rng = jax.random.PRNGKey(1)
    state = trainer.init_state(rng, batch=2, max_length=7)
    gen = np.random.default_rng(1)
    batches = [
        (gen.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32),
         gen.integers(1, 50, (4, 7)).astype(np.int32))
        for _ in range(4)
    ]
    g0 = jax.tree_util.tree_leaves(state.g_params["mapping"])[0].copy()
    state, d_loss, g_loss = trainer.train_epoch(state, batches, rng)
    assert int(state.step) == 4
    assert np.isfinite(d_loss) and np.isfinite(g_loss)
    assert np.any(np.asarray(
        jax.tree_util.tree_leaves(state.g_params["mapping"])[0])
        != np.asarray(g0))


def test_trainer_sample_uses_ema():
    cfg = tiny_cfg()
    trainer = Gen2Trainer(cfg, bert_cfg=TINY_BERT)
    rng = jax.random.PRNGKey(2)
    state = trainer.init_state(rng, batch=2, max_length=7)
    tokens = jnp.ones((2, 7), jnp.int32)
    img = trainer.sample(state, tokens, rng)
    assert img.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(img)))
