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
