"""Parity tests for the folded low-resolution UpBlock conv
(models/blocks.py _FoldedUpConv3x3, cfg.JAX.UPBLOCK_FUSED).

The fused form must be an exact algebraic identity of the reference
upBlock's upsample-then-conv (AttnGAN2/code/model.py:39-45): same
parameter tree, same values, same gradients — it only changes where the
FLOPs and the HBM traffic happen.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.models.blocks import (
    Conv3x3,
    UpBlock,
    fold_up2x_kernel,
    upsample_nearest_2x,
)


IMPLS = ["fold2x2", "phase3x3", "convt"]


def _conv_pair(cin, cout, h=9, w=7, b=2, seed=0, impl="fold2x2"):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    naive = Conv3x3(cout)
    fused = Conv3x3(cout, up2x=True, up2x_impl=impl)
    params = naive.init(jax.random.PRNGKey(seed), upsample_nearest_2x(x))
    return x, naive, fused, params


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("cin,cout", [(5, 4), (16, 8)])
def test_fused_matches_upsample_then_conv(cin, cout, impl):
    x, naive, fused, params = _conv_pair(cin, cout, impl=impl)
    y_ref = naive.apply(params, upsample_nearest_2x(x))
    y_fused = fused.apply(params, x)
    assert y_fused.shape == y_ref.shape
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_param_tree_identical():
    """Same path, shape, AND initial values (same init RNG stream) — so
    checkpoints and the torch importer work unchanged under the flag."""
    x, naive, fused, _ = _conv_pair(6, 4)
    p_naive = naive.init(jax.random.PRNGKey(3), upsample_nearest_2x(x))
    p_fused = fused.init(jax.random.PRNGKey(3), x)
    flat_n = jax.tree_util.tree_leaves_with_path(p_naive)
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [p for p, _ in flat_n] == [p for p, _ in flat_f]
    for (_, a), (_, b) in zip(flat_n, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("impl", IMPLS)
def test_fused_gradients_match(impl):
    x, naive, fused, params = _conv_pair(5, 4, impl=impl)
    ct = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((2, 18, 14, 4))
        .astype(np.float32)
    )

    def loss_naive(p, x):
        return jnp.sum(naive.apply(p, upsample_nearest_2x(x)) * ct)

    def loss_fused(p, x):
        return jnp.sum(fused.apply(p, x) * ct)

    gn = jax.grad(loss_naive, argnums=(0, 1))(params, x)
    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gn), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fold_kernel_flop_shape():
    k = jnp.asarray(np.random.default_rng(0).standard_normal((3, 3, 5, 7)))
    kk = fold_up2x_kernel(k)
    assert kk.shape == (2, 2, 5, 28)


@pytest.mark.parametrize("fused", [False, True])
def test_upblock_runs_and_agrees(fused):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    blk_ref = UpBlock(4)
    blk = UpBlock(4, fused=fused)
    params = blk_ref.init(jax.random.PRNGKey(0), x)
    y_ref = blk_ref.apply(params, x, mutable=["batch_stats"])[0]
    y = blk.apply(params, x, mutable=["batch_stats"])[0]
    assert y.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_generator_full_parity_under_flag():
    """GNet output is identical (up to conv reassociation) with the flag on,
    using the SAME parameters."""
    from sba_gan_tpu.models.generator import build_generator

    base = {
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 16, "W_DIM": 32,
                "CONDITION_DIM": 12, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
        "TREE": {"BRANCH_NUM": 3},
    }
    cfg0 = cfg_from_dict(base)
    cfg1 = cfg_from_dict({**base, "JAX": {"UPBLOCK_FUSED": True}})
    g0 = build_generator(cfg0)
    g1 = build_generator(cfg1)

    rng = np.random.default_rng(0)
    b = 2
    z = jnp.asarray(rng.standard_normal((b, 16)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((b, 32)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, 6, 32)).astype(np.float32))
    mask = jnp.zeros((b, 6), bool).at[:, 4:].set(True)
    key = jax.random.PRNGKey(7)

    v0 = g0.init(jax.random.PRNGKey(1), z, sent, words, mask, key)
    out0 = g0.apply(v0, z, sent, words, mask, key, mutable=["batch_stats"])[0]
    out1 = g1.apply(v0, z, sent, words, mask, key, mutable=["batch_stats"])[0]
    for a, b_ in zip(out0[0], out1[0]):  # fake_imgs
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )
