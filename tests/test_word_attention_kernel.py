"""Pallas fused word-attention: interpreter-mode parity vs the XLA reference
path, forward and backward (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.ops.word_attention import (
    word_attention,
    word_attention_xla,
)


def make_inputs(rng, b=2, ql=64, t=7, d=16):
    q = rng.standard_normal((b, ql, d)).astype(np.float32)
    s = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = rng.integers(2, t + 1, (b,))
    pad = np.arange(t)[None, :] >= lens[:, None]
    return jnp.asarray(q), jnp.asarray(s), jnp.asarray(pad)


def test_forward_parity(rng):
    q, s, pad = make_inputs(rng)
    ctx_p, attn_p = word_attention(q, s, pad, impl="interpret")
    ctx_x, attn_x = word_attention(q, s, pad, impl="xla")
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_p), np.asarray(attn_x),
                               rtol=1e-5, atol=1e-6)
    # masked words get zero attention everywhere
    assert np.all(np.asarray(attn_p)[0, :, -1] < 1e-6) or not pad[0, -1]


def test_backward_parity(rng):
    q, s, pad = make_inputs(rng, ql=128, t=5, d=8)
    w = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    def loss(impl):
        def f(q_, s_):
            ctx, attn = word_attention(q_, s_, pad, impl=impl)
            return jnp.sum(ctx * w) + 0.5 * jnp.sum(attn ** 2)
        return f

    gq_p, gs_p = jax.grad(loss("interpret"), argnums=(0, 1))(q, s)
    gq_x, gs_x = jax.grad(loss("xla"), argnums=(0, 1))(q, s)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-5)


def test_none_mask_and_uneven_ql(rng):
    # QL not divisible by the tile falls back to XLA transparently
    q = jnp.asarray(rng.standard_normal((1, 60, 8)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    ctx, attn = word_attention(q, s, None, impl="interpret", tile_q=64)
    ctx_x, attn_x = word_attention_xla(q, s, jnp.zeros((1, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)


def test_module_uses_kernel(rng):
    """WordAttention module with impl='interpret' equals impl='xla'."""
    from sba_gan_tpu.models.attention import WordAttention

    h = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((2, 5, 24)).astype(np.float32))
    pad = jnp.asarray(np.array([[0, 0, 0, 1, 1], [0, 0, 1, 1, 1]], bool))
    m_x = WordAttention(16, impl="xla")
    m_p = WordAttention(16, impl="interpret")
    v = m_x.init(jax.random.PRNGKey(0), h, words, pad)
    cx, ax = m_x.apply(v, h, words, pad)
    cp, ap = m_p.apply(v, h, words, pad)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(cp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(ap), rtol=1e-5, atol=1e-6)
