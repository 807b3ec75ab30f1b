"""Parity tests for the memory-compact BatchNorm
(models/blocks.py _CompactBatchNorm, cfg.JAX.BN_COMPACT).

The compact form must be numerically equivalent to the flax nn.BatchNorm
configuration it replaces (torch BatchNorm2d hyperparameters — reference
AttnGAN2/code/model.py:39-71 uses nn.BatchNorm2d throughout the G blocks):
same variable tree, same values/gradients up to rounding, same running-
stat updates.  It only changes WHERE the f32 math happens — per-channel
folded scale/offset instead of promoting the whole (B,H,W,C) activation
(the promotion was the largest HLO temp of the b256 step on-chip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.models.blocks import BatchNorm


def _x(shape=(4, 6, 5, 7), seed=0, dtype=np.float32, scale=1.0, shift=0.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.standard_normal(shape) * scale + shift).astype(dtype))


def _pair(dtype=jnp.float32):
    return BatchNorm(dtype=dtype), BatchNorm(dtype=dtype, compact=True)


def test_variable_tree_identical():
    """Same paths, shapes AND initial values (same param-RNG folding), so
    checkpoints and the torch importers work unchanged under the flag."""
    ref, cmp_ = _pair()
    x = _x()
    v_ref = ref.init(jax.random.PRNGKey(3), x)
    v_cmp = cmp_.init(jax.random.PRNGKey(3), x)
    flat_r = jax.tree_util.tree_leaves_with_path(v_ref)
    flat_c = jax.tree_util.tree_leaves_with_path(v_cmp)
    assert [p for p, _ in flat_r] == [p for p, _ in flat_c]
    for (_, a), (_, b) in zip(flat_r, flat_c):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("train", [True, False])
def test_values_and_running_stats_match_f32(train):
    ref, cmp_ = _pair()
    x = _x(scale=3.0, shift=1.5)
    variables = ref.init(jax.random.PRNGKey(0), x)
    # make running stats distinct from init so eval mode is a real check
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.25 if a.ndim else a, variables)

    y_ref, mut_ref = ref.apply(variables, x, train, mutable=["batch_stats"])
    y_cmp, mut_cmp = cmp_.apply(variables, x, train, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_cmp), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_cmp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_gradients_match_f32():
    ref, cmp_ = _pair()
    x = _x(scale=2.0)
    variables = ref.init(jax.random.PRNGKey(0), x)
    ct = _x(seed=9)

    def loss(mod):
        def f(params, x):
            y, _ = mod.apply(
                {**variables, "params": params}, x, True,
                mutable=["batch_stats"])
            return jnp.sum(y * ct)
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(variables["params"], x)
    g_cmp = jax.grad(loss(cmp_), argnums=(0, 1))(variables["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_cmp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_bf16_path_close_and_bf16_output():
    """bf16 compute dtype: compact quantizes the folded (a, b) to bf16
    before the elementwise apply instead of the f32 result after it — one
    extra rounding, bounded by bf16 eps."""
    ref, cmp_ = _pair(dtype=jnp.bfloat16)
    x = _x(scale=2.0).astype(jnp.bfloat16)
    variables = ref.init(jax.random.PRNGKey(0), x)
    y_ref, _ = ref.apply(variables, x, True, mutable=["batch_stats"])
    y_cmp, _ = cmp_.apply(variables, x, True, mutable=["batch_stats"])
    assert y_cmp.dtype == jnp.bfloat16
    a = np.asarray(y_ref, np.float32).ravel()
    b = np.asarray(y_cmp, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(b, a, rtol=0.05, atol=0.05)


def test_instance_norm_compact_matches():
    """instance_norm_2d compact path: same per-(sample,channel) normalize,
    fast-variance vs two-pass variance only differ at rounding level."""
    from sba_gan_tpu.models.blocks import instance_norm_2d

    x = _x(shape=(3, 8, 9, 5), scale=2.5, shift=-0.7)
    y_ref = instance_norm_2d(x)
    y_cmp = instance_norm_2d(x, compact=True)
    np.testing.assert_allclose(
        np.asarray(y_cmp), np.asarray(y_ref), rtol=1e-4, atol=1e-5)

    g_ref = jax.grad(lambda v: jnp.sum(instance_norm_2d(v) ** 2))(x)
    g_cmp = jax.grad(
        lambda v: jnp.sum(instance_norm_2d(v, compact=True) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_cmp), np.asarray(g_ref), rtol=1e-3, atol=1e-5)

    xb = x.astype(jnp.bfloat16)
    yb = instance_norm_2d(xb, compact=True)
    assert yb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(yb, np.float32), np.asarray(y_ref), rtol=0.05, atol=0.05)


def test_discriminator_parity_under_flag():
    """DNet256 (backbone + both heads) is unchanged by the flag with the
    SAME parameters."""
    from sba_gan_tpu.models.discriminator import build_discriminators

    base = {
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 16, "W_DIM": 32,
                "CONDITION_DIM": 12, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
        "TREE": {"BRANCH_NUM": 3},
    }
    d0 = build_discriminators(cfg_from_dict(base))[-1]
    d1 = build_discriminators(
        cfg_from_dict({**base, "JAX": {"BN_COMPACT": True}}))[-1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 256, 256, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    v0 = d0.init(jax.random.PRNGKey(2), x, c, method="init_all")
    v1 = d1.init(jax.random.PRNGKey(2), x, c, method="init_all")
    for a, b_ in zip(jax.tree_util.tree_leaves(v0),
                     jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    o0, _ = d0.apply(v0, x, c, method="init_all", mutable=["batch_stats"])
    o1, _ = d1.apply(v0, x, c, method="init_all", mutable=["batch_stats"])
    for a, b_ in zip(jax.tree_util.tree_leaves(o0),
                     jax.tree_util.tree_leaves(o1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


def test_generator_full_parity_under_flag():
    """GNet output with BN_COMPACT on equals the default path with the
    SAME parameters (f32 compute: rounding-level tolerance)."""
    from sba_gan_tpu.models.generator import build_generator

    base = {
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 16, "W_DIM": 32,
                "CONDITION_DIM": 12, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
        "TREE": {"BRANCH_NUM": 3},
    }
    cfg0 = cfg_from_dict(base)
    cfg1 = cfg_from_dict({**base, "JAX": {"BN_COMPACT": True}})
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
    v1 = g1.init(jax.random.PRNGKey(1), z, sent, words, mask, key)
    # identical init under the flag
    for a, b_ in zip(jax.tree_util.tree_leaves(v0),
                     jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    out0, mut0 = g0.apply(v0, z, sent, words, mask, key,
                          mutable=["batch_stats"])
    out1, mut1 = g1.apply(v0, z, sent, words, mask, key,
                          mutable=["batch_stats"])
    for a, b_ in zip(out0[0], out1[0]):  # fake_imgs
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(mut0),
                     jax.tree_util.tree_leaves(mut1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_large_scope_selects_by_spatial_size():
    """compact='large' uses the compact path only at >=128^2 activations
    (surgical scope from the r4 trace: the flax f32 promotion costs ~10 ms
    at the 256^2 UpBlock BN while full-scope bnc loses 17 ms net at b128).
    Values must match the f32 flax reference in BOTH regimes, and the
    variable tree must be identical so the flag can flip freely."""
    rng = np.random.default_rng(0)
    for h in (64, 128):
        x = jnp.asarray(rng.standard_normal((2, h, h, 4)).astype(np.float32))
        ref_bn = BatchNorm(dtype=jnp.float32, compact=False)
        lrg_bn = BatchNorm(dtype=jnp.float32, compact="large")
        v_ref = ref_bn.init(jax.random.PRNGKey(0), x, True)
        v_lrg = lrg_bn.init(jax.random.PRNGKey(0), x, True)
        assert (jax.tree_util.tree_structure(v_ref)
                == jax.tree_util.tree_structure(v_lrg))
        y_ref, m_ref = ref_bn.apply(v_ref, x, True,
                                    mutable=["batch_stats"])
        y_lrg, m_lrg = lrg_bn.apply(v_lrg, x, True,
                                    mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_lrg), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"h={h}")
        for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                        jax.tree_util.tree_leaves(m_lrg)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-5)
