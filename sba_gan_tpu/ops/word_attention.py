"""Fused word-attention TPU kernel (Pallas).

The generator's hot op (reference GlobalAttentionGeneral,
AttnGAN2/code/GlobalAttention.py:72-121): every pixel of a feature map
attends over the caption's word embeddings —

    scores  = Q @ S^T          (QL x T)   QL = H*W up to 4096, T <= 25
    P       = softmax(scores + pad_bias)
    context = P @ S            (QL x D)

Run through cuDNN in the reference as two bmm launches with a masked-softmax
in between (three HBM round-trips of the (B, QL, T) tensor).  The Pallas
kernel keeps the whole tile pipeline in VMEM: one grid step loads a
(TQ, D) query tile + the full (T, D) word table, computes scores, the
numerically-stable masked softmax, and the context matmul without
materializing scores in HBM.  Attention probabilities are emitted too (the
training loop visualizes them and the backward pass reuses them).

The custom VJP recomputes nothing: residuals are (Q, S, P) and the backward
is three small matmuls (dP = dY S^T; dZ = P*(dP - rowsum(dP*P));
dQ = dZ S; dS = dZ^T Q + P^T dY), left to XLA which fuses them cleanly.

A pure-XLA path (`word_attention_xla`) is the reference semantics and the
fallback on non-TPU backends; `interpret=True` lets tests run the kernel on
CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


# --------------------------------------------------------------------------
# Reference XLA path
# --------------------------------------------------------------------------
def word_attention_xla(
    query: jax.Array, source: jax.Array, bias: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """query (B, QL, D), source (B, T, D), bias (B, T) additive (0 / -1e9).
    Returns (context (B, QL, D) f32, attn (B, QL, T) f32)."""
    scores = jnp.einsum(
        "bqd,btd->bqt", query, source, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(scores + bias[:, None, :].astype(jnp.float32), axis=2)
    context = jnp.einsum(
        "bqt,btd->bqd",
        attn.astype(source.dtype),
        source,
        preferred_element_type=jnp.float32,
    )
    return context, attn


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------
def _attn_kernel(q_ref, s_ref, b_ref, ctx_ref, p_ref):
    q = q_ref[0]  # (TQ, D)
    s = s_ref[0]  # (T, D)
    bias = b_ref[0]  # (1, T)
    scores = (
        jax.lax.dot_general(
            q,
            s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )  # (TQ, T)
    # numerically-stable softmax over words
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    ctx = jnp.dot(
        p.astype(s.dtype), s, preferred_element_type=jnp.float32
    )  # (TQ, D)
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)
    p_ref[0] = p.astype(p_ref.dtype)


def _forward_pallas(query, source, bias, tile_q: int, interpret: bool):
    b, ql, d = query.shape
    t = source.shape[1]
    tq = min(tile_q, ql)
    assert ql % tq == 0, (ql, tq)
    grid = (b, ql // tq)
    bias2 = bias[:, None, :].astype(jnp.float32)  # (B, 1, T)

    ctx, p = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, t), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ql, d), jnp.float32),
            jax.ShapeDtypeStruct((b, ql, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ql * t * d * 2,
            bytes_accessed=4 * b * (ql * d * 2 + t * d + ql * t),
            transcendentals=b * ql * t,
        ),
        interpret=interpret,
    )(query, source, bias2)
    return ctx, p


# --------------------------------------------------------------------------
# custom-vjp wrapper
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _word_attention(query, source, bias, tile_q, interpret):
    return _forward_pallas(query, source, bias, tile_q, interpret)


def _fwd(query, source, bias, tile_q, interpret):
    ctx, p = _forward_pallas(query, source, bias, tile_q, interpret)
    return (ctx, p), (query, source, p)


def _bwd(tile_q, interpret, res, cts):
    query, source, p = res
    d_ctx, d_p_out = cts
    d_ctx = d_ctx.astype(jnp.float32)
    # dP = dY S^T (+ direct cotangent on the attention output)
    d_p = jnp.einsum(
        "bqd,btd->bqt", d_ctx, source.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if d_p_out is not None:
        d_p = d_p + d_p_out.astype(jnp.float32)
    # softmax backward
    inner = jnp.sum(d_p * p, axis=2, keepdims=True)
    d_z = p * (d_p - inner)
    d_q = jnp.einsum(
        "bqt,btd->bqd", d_z, source.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(query.dtype)
    d_s = (
        jnp.einsum("bqt,bqd->btd", d_z, query.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bqt,bqd->btd", p, d_ctx,
                     preferred_element_type=jnp.float32)
    ).astype(source.dtype)
    return d_q, d_s, None


_word_attention.defvjp(_fwd, _bwd)


def word_attention(
    query: jax.Array,
    source: jax.Array,
    pad_mask: Optional[jax.Array] = None,
    *,
    impl: str = "auto",
    tile_q: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Fused word attention.

    query:    (B, QL, D) image-feature queries.
    source:   (B, T, D) projected word embeddings.
    pad_mask: (B, T) bool, True at padding, or None.
    impl:     'auto' (pallas on TPU, xla elsewhere) | 'pallas' | 'xla' |
              'interpret' (pallas interpreter — tests).

    Returns (context (B, QL, D) f32, attn (B, QL, T) f32).
    """
    if pad_mask is None:
        bias = jnp.zeros(source.shape[:2], jnp.float32)
    else:
        bias = jnp.where(pad_mask, NEG_INF, 0.0).astype(jnp.float32)

    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "xla":
        return word_attention_xla(query, source, bias)
    if query.shape[1] % min(tile_q, query.shape[1]) != 0:
        return word_attention_xla(query, source, bias)
    return _word_attention(query, source, bias, tile_q, impl == "interpret")
