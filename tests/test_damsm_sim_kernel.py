"""Fused DAMSM similarity kernel (ops/damsm_sim.py): interpreter-mode
parity vs the dense-grid XLA words_loss, forward and flash backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.losses.damsm import words_loss
from sba_gan_tpu.ops.damsm_sim import damsm_sim


def make_inputs(rng, b=8, t=6, r=9, d=16):
    words = rng.standard_normal((b, t, d)).astype(np.float32)
    img = rng.standard_normal((b, r, d)).astype(np.float32)
    lens = rng.integers(2, t + 1, (b,)).astype(np.int32)
    cls = rng.integers(0, 4, (b,)).astype(np.int32)
    return (jnp.asarray(words), jnp.asarray(img), jnp.asarray(lens),
            jnp.asarray(cls))


def test_loss_forward_parity(rng):
    words, img, lens, cls = make_inputs(rng)
    labels = jnp.arange(8)
    lx = words_loss(img, words, labels, lens, cls, impl="xla")
    lp = words_loss(img, words, labels, lens, cls, impl="interpret",
                    tile_i=4)
    np.testing.assert_allclose(float(lp[0]), float(lx[0]), rtol=2e-5)
    np.testing.assert_allclose(float(lp[1]), float(lx[1]), rtol=2e-5)


def test_loss_backward_parity(rng):
    words, img, lens, cls = make_inputs(rng)
    labels = jnp.arange(8)

    def loss(impl):
        def f(img_, words_):
            l0, l1 = words_loss(img_, words_, labels, lens, cls, impl=impl,
                                tile_i=4)
            return l0 + 2.0 * l1
        return f

    gi_x, gw_x = jax.grad(loss("xla"), argnums=(0, 1))(img, words)
    gi_p, gw_p = jax.grad(loss("interpret"), argnums=(0, 1))(img, words)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-6)


def test_sim_matches_grid_formula(rng):
    """damsm_sim directly vs the dense grid computed by hand, bf16 matmul
    inputs as in the train-step configuration (loose tolerance)."""
    words, img, lens, _ = make_inputs(rng, b=4, t=5, r=7, d=8)
    sim = damsm_sim(words, img, lens, gamma1=4.0, gamma2=5.0, tile_i=2,
                    mm_dtype=jnp.float32, interpret=True)
    assert sim.shape == (4, 4)
    # hand-computed pair (2, 3)
    w, x = np.asarray(words)[2], np.asarray(img)[3]
    l = int(lens[2])
    s = w[:l] @ x.T
    a1 = np.exp(s - s.max(0)) / np.exp(s - s.max(0)).sum(0)
    z = 4.0 * a1
    a2 = np.exp(z - z.max(1, keepdims=True))
    a2 /= a2.sum(1, keepdims=True)
    c = a2 @ x
    cos = (w[:l] * c).sum(1) / np.maximum(
        np.linalg.norm(w[:l], axis=1) * np.linalg.norm(c, axis=1), 1e-8)
    expect = np.log(np.exp(5.0 * cos - (5.0 * cos).max()).sum()) + (
        5.0 * cos).max()
    np.testing.assert_allclose(float(sim[2, 3]), expect, rtol=1e-5)


@pytest.mark.slow  # compiles two full GAN steps (~2 min on this host)
def test_gan_step_with_kernel_matches_xla(rng):
    """Full GAN train step with JAX.DAMSM_SIM_IMPL=interpret produces the
    same losses as the dense-grid XLA path — the kernel integrates into
    make_gan_train_step (train/gan.py) exactly, not just at the loss call."""
    from test_gan_step import N_WORDS, make_batch, tiny_cfg

    from sba_gan_tpu.train import build_models, init_gan_state, \
        make_gan_train_step

    batch = None
    logs = {}
    for impl in ("xla", "interpret"):
        cfg = tiny_cfg(**{"JAX.DAMSM_SIM_IMPL": impl,
                          "JAX.DAMSM_SIM_TILE": 4})
        models = build_models(cfg, N_WORDS)
        state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
        if batch is None:
            batch = make_batch(cfg, np.random.default_rng(3), 8)
        step = jax.jit(make_gan_train_step(cfg, models))
        _, logs[impl] = step(state, *batch, jax.random.PRNGKey(1))
    for k in logs["xla"]:
        np.testing.assert_allclose(
            float(logs["interpret"][k]), float(logs["xla"][k]),
            rtol=5e-5, atol=1e-6, err_msg=f"log {k} diverges under kernel")


def test_uneven_batch_falls_back(rng):
    """B not divisible by tile_i: words_loss silently uses the XLA path."""
    words, img, lens, cls = make_inputs(rng, b=6)
    labels = jnp.arange(6)
    lp = words_loss(img, words, labels, lens, cls, impl="interpret",
                    tile_i=4)
    lx = words_loss(img, words, labels, lens, cls, impl="xla")
    np.testing.assert_allclose(float(lp[0]), float(lx[0]), rtol=1e-6)
