"""Mosaic (TPU) lowering regression tests for the Pallas kernels.

``jax.export.export(..., platforms=['tpu'])`` runs the full Pallas->Mosaic
MLIR lowering on a CPU host — no device needed — which enforces TPU block
rules the interpreter does not (e.g. the minor block dim must be
128-divisible or equal to the array dim; this exact check caught the
original (tile_i, 1) sim/cotangent column blocks in ops/damsm_sim.py that
would have failed to compile on hardware).  It does NOT execute: on-chip
numerics are covered by scripts/check_sim_kernel_tpu.py /
check_word_attn_tpu.py when a TPU is reachable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.losses.damsm import words_loss
from sba_gan_tpu.ops.word_attention import word_attention


@pytest.mark.parametrize("b,tile", [(32, 16), (128, 16), (128, 32)])
def test_damsm_sim_kernel_lowers_for_tpu(b, tile):
    t, r, d = 18, 289, 256
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(4, t + 1, (b,)).astype(np.int32))
    labels = jnp.arange(b)

    def loss(img_, words_):
        l0, l1 = words_loss(img_, words_, labels, lens, None,
                            einsum_dtype=jnp.bfloat16, impl="pallas",
                            tile_i=tile)
        return l0 + 2.0 * l1

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    exp = jax.export.export(f, platforms=["tpu"])(img, words)
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.parametrize("b,ql,d", [(8, 64 * 64, 32), (4, 128 * 128, 32)])
def test_word_attention_kernel_lowers_for_tpu(b, ql, d):
    t = 18
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, ql, d)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.asarray(
        np.arange(t)[None, :] >= rng.integers(4, t + 1, (b,))[:, None])

    def loss(q_, s_):
        ctx, attn = word_attention(q_, s_, mask, impl="pallas")
        return jnp.sum(ctx * ctx) + jnp.sum(attn)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    exp = jax.export.export(f, platforms=["tpu"])(q, s)
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow  # full flagship step export ~2 min on this host
def test_full_gan_step_lowers_for_tpu():
    """The complete flagship train step (kernel impl + chunked remat
    encoder + staged G remat) must lower for TPU — whole-program insurance
    on top of the per-kernel checks above."""
    from sba_gan_tpu.config import cfg_from_dict
    from sba_gan_tpu.train import (
        build_models, init_gan_state, make_gan_train_step,
    )

    cfg = cfg_from_dict({
        "TREE": {"BRANCH_NUM": 3},
        "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
        "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
        "TRAIN": {"BATCH_SIZE": 128,
                  "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0,
                             "LAMBDA": 5.0}},
        "JAX": {"DTYPE": "bfloat16", "LOSS_DTYPE": "bfloat16",
                "REMAT_IMAGE_ENCODER": True, "DAMSM_CHUNKS": 4,
                "DAMSM_SIM_IMPL": "pallas", "REMAT_GENERATOR": True},
    })
    models = build_models(cfg, 5450)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))

    b, t = 128, 18
    rng = np.random.default_rng(0)
    imgs = tuple(
        jnp.asarray(rng.uniform(-1, 1, (b, 64 * 2 ** i, 64 * 2 ** i, 3))
                    .astype(np.float32))
        for i in range(3)
    )
    caps = np.zeros((b, t), np.int32)
    lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
    for i, l in enumerate(lens):
        caps[i, :l] = rng.integers(1, 5450, (l,))
    cls = rng.integers(0, 200, (b,)).astype(np.int32)
    exp = jax.export.export(step, platforms=["tpu"])(
        state, imgs, jnp.asarray(caps), jnp.asarray(lens),
        jnp.asarray(cls), jax.random.PRNGKey(1))
    assert len(exp.mlir_module_serialized) > 0
