"""Fused DAMSM word-region similarity kernel (Pallas, flash-style).

The DAMSM words loss (reference words_loss, AttnGAN2/code/miscc/losses.py:
62-132) scores every (text i, image j) pair through a word-region attention:

    S   = W_i @ X_j^T                       (T x R) word/region scores
    A1  = softmax_T(S)   over valid words   (Eq. 8)
    A2  = softmax_R(g1 * A1)                (Eq. 9)
    C   = A2 @ X_j                          (T x D) region context per word
    rs  = g2 * cos(W_i, C)  per word        (row similarity)
    sim[i, j] = logsumexp_t(rs)   over valid words (Eq. 10)

The XLA formulation (losses/damsm.py) materializes the full (B, B, T, R)
attention grid plus a (B, B, T, D) context tensor in HBM — at B=128,
T=18, R=289, D=256 that is hundreds of MB of traffic per softmax pass,
for only ~90 GFLOP of useful matmul work: the op is HBM-bound.

This kernel computes sim (B, B) without ever materializing the grid: one
grid step loads a (TI, T, D) tile of word embeddings and one image's
(R, D) region table into VMEM and runs the whole chain there.  The custom
VJP is flash-style as well: residuals are just (words, img, valid, sim);
the backward recomputes the per-pair forward in VMEM and accumulates
d_img over texts (and d_words over images in a second kernel, which XLA
dead-code-eliminates when the words cotangent is unused — the GAN step
differentiates only through the image branch, train/gan.py:356).

The XLA path stays the semantics reference; `interpret=True` runs the
kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
EPS = 1e-8


# --------------------------------------------------------------------------
# Shared per-pair math (runs inside kernels on VMEM tiles; f32 throughout,
# matmul inputs in `mm_dtype` with f32 accumulation)
# --------------------------------------------------------------------------
def _pair_forward(w, x, valid, gamma1, gamma2, mm_dtype):
    """w (TI, T, D) f32, x (R, D) f32, valid (TI, T) int32 (1 = real word).

    Returns (rs (TI, T) masked row similarities, a1, a2, c) — the
    intermediates the backward needs.  The mask stays int32 and grows its
    minor dim BEFORE the bool compare: the tunnel's Mosaic rejects
    broadcast_in_dim that inserts a minor dim on i1 ("only supported for
    32-bit types"), while the same insert on i32 lowers fine."""
    ti, t, d = w.shape
    r = x.shape[0]
    valid_b = valid != 0
    valid3 = valid[:, :, None] != 0
    w2 = w.reshape(ti * t, d)
    s = jax.lax.dot_general(
        w2.astype(mm_dtype), x.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ti, t, r)
    s = jnp.where(valid3, s, NEG_INF)
    # Eq. 8: softmax over words (axis 1); every text has >= 1 valid word.
    m1 = jnp.max(s, axis=1, keepdims=True)
    e1 = jnp.exp(s - m1)
    a1 = e1 / jnp.sum(e1, axis=1, keepdims=True)
    # Eq. 9: gamma1-sharpened softmax over regions (axis 2).
    z = gamma1 * a1
    m2 = jnp.max(z, axis=2, keepdims=True)
    e2 = jnp.exp(z - m2)
    a2 = e2 / jnp.sum(e2, axis=2, keepdims=True)
    c = jax.lax.dot_general(
        a2.reshape(ti * t, r).astype(mm_dtype), x.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ti, t, d)
    num = jnp.sum(w * c, axis=2)
    wn = jnp.sqrt(jnp.sum(w * w, axis=2))
    cn = jnp.sqrt(jnp.sum(c * c, axis=2))
    denom = jnp.maximum(wn * cn, EPS)
    rs = jnp.where(valid_b, gamma2 * num / denom, NEG_INF)
    return rs, a1, a2, c


def _pair_backward(w, x, valid, g, gamma1, gamma2, mm_dtype):
    """Recompute the pair forward and return (d_w (TI,T,D), d_x (R,D)).

    g (TI, 1) is d_sim[i, j] for this tile's texts against image j (kept
    2D — TPU kernels avoid 1D vectors); the logsumexp jacobian (softmax
    of rs over valid words) is applied here."""
    ti, t, d = w.shape
    r = x.shape[0]
    valid_b = valid != 0
    valid3 = valid[:, :, None] != 0  # minor-dim insert on i32, see fwd
    rs, a1, a2, c = _pair_forward(w, x, valid, gamma1, gamma2, mm_dtype)
    # logsumexp backward: d_rs = g * softmax(rs) over valid t.
    m = jnp.max(rs, axis=1, keepdims=True)
    e = jnp.where(valid_b, jnp.exp(rs - m), 0.0)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    d_rs = g * p  # (TI, T); zero at invalid t
    num = jnp.sum(w * c, axis=2)
    wn = jnp.sqrt(jnp.sum(w * w, axis=2))
    cn = jnp.sqrt(jnp.sum(c * c, axis=2))
    denom_raw = wn * cn
    denom = jnp.maximum(denom_raw, EPS)
    live = denom_raw > EPS
    d_num = d_rs * gamma2 / denom
    d_denom = jnp.where(live, -d_rs * gamma2 * num / (denom * denom), 0.0)
    safe_cn = jnp.maximum(cn, EPS)
    safe_wn = jnp.maximum(wn, EPS)
    d_cn = d_denom * wn
    d_wn = d_denom * cn
    d_c = d_num[:, :, None] * w + (d_cn / safe_cn)[:, :, None] * c
    d_w = d_num[:, :, None] * c + (d_wn / safe_wn)[:, :, None] * w
    # C = A2 @ X
    d_a2 = jax.lax.dot_general(
        d_c.reshape(ti * t, d).astype(mm_dtype), x.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ti, t, r)
    d_x = jax.lax.dot_general(
        a2.reshape(ti * t, r).astype(mm_dtype),
        d_c.reshape(ti * t, d).astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, D)
    # A2 = softmax_R(gamma1 * A1)
    inner2 = jnp.sum(d_a2 * a2, axis=2, keepdims=True)
    d_a1 = gamma1 * a2 * (d_a2 - inner2)
    # A1 = softmax_T(S)
    inner1 = jnp.sum(d_a1 * a1, axis=1, keepdims=True)
    d_s = a1 * (d_a1 - inner1)  # zero rows at invalid t (a1 = 0 there)
    # S = W @ X^T
    d_w = d_w + jax.lax.dot_general(
        d_s.reshape(ti * t, r).astype(mm_dtype), x.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ti, t, d)
    d_x = d_x + jax.lax.dot_general(
        d_s.reshape(ti * t, r).astype(mm_dtype),
        w.reshape(ti * t, d).astype(mm_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_w = jnp.where(valid3, d_w, 0.0)
    return d_w, d_x


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------
def _fwd_kernel(gamma1, gamma2, mm_dtype, w_ref, x_ref, v_ref, sim_ref):
    # sim_ref holds the full (TI, B_img) row block (Mosaic requires the
    # minor block dim to be 128-divisible or the whole array dim — a
    # (TI, 1) column block is not lowerable); each grid step fills the
    # column of the image j it computed.  The block's index_map is
    # constant over j (the fastest grid axis), so it stays resident in
    # VMEM across the j sweep and is written back once fully populated.
    # The column write is a one-hot masked accumulate over the whole
    # block: the tunnel's Mosaic cannot lower a dynamic lane-offset
    # store (`sim_ref[:, pl.ds(j, 1)]` -> "index in dimension 1 must be
    # a multiple of 128"); the (TI, B_img) select+add is noise next to
    # the pair math.
    j = pl.program_id(1)
    rs, _, _, _ = _pair_forward(
        w_ref[...], x_ref[0], v_ref[...], gamma1, gamma2, mm_dtype
    )
    # logsumexp over valid words (rs is NEG_INF at invalid positions).
    m = jnp.max(rs, axis=1, keepdims=True)
    col = m + jnp.log(jnp.sum(jnp.exp(rs - m), axis=1, keepdims=True))
    lane = jax.lax.broadcasted_iota(jnp.int32, sim_ref.shape, 1)
    contrib = jnp.where(lane == j, col, 0.0).astype(sim_ref.dtype)

    @pl.when(j == 0)
    def _init():
        sim_ref[...] = contrib

    @pl.when(j != 0)
    def _acc():
        sim_ref[...] += contrib


def _dimg_kernel(gamma1, gamma2, mm_dtype, w_ref, x_ref, v_ref, g_ref,
                 dx_ref):
    # g_ref is the full (TI, B_img) row block of the sim cotangent (same
    # Mosaic minor-dim rule as the forward); this pair's column is j =
    # program_id(0) (image-major grid).  Dynamic lane-offset loads are
    # as unlowerable as stores, so the column is extracted by a one-hot
    # masked lane reduction.
    j = pl.program_id(0)
    i = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 1)
    g_col = jnp.sum(jnp.where(lane == j, g_ref[...], 0.0), axis=1,
                    keepdims=True)
    _, d_x = _pair_backward(
        w_ref[...], x_ref[0], v_ref[...], g_col,
        gamma1, gamma2, mm_dtype,
    )

    @pl.when(i == 0)
    def _init():
        dx_ref[0] = d_x.astype(dx_ref.dtype)

    @pl.when(i != 0)
    def _acc():
        dx_ref[0] += d_x.astype(dx_ref.dtype)


def _dwords_kernel(gamma1, gamma2, mm_dtype, w_ref, x_ref, v_ref, g_ref,
                   dw_ref):
    j = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 1)
    g_col = jnp.sum(jnp.where(lane == j, g_ref[...], 0.0), axis=1,
                    keepdims=True)
    d_w, _ = _pair_backward(
        w_ref[...], x_ref[0], v_ref[...], g_col,
        gamma1, gamma2, mm_dtype,
    )

    @pl.when(j == 0)
    def _init():
        dw_ref[...] = d_w.astype(dw_ref.dtype)

    @pl.when(j != 0)
    def _acc():
        dw_ref[...] += d_w.astype(dw_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------
def _call_fwd(words, img, valid, gamma1, gamma2, tile_i, mm_dtype,
              interpret):
    b, t, d = words.shape
    bj, r, _ = img.shape
    grid = (b // tile_i, bj)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, gamma1, gamma2, mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, t), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, bj), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, bj), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * bj * t * r * d,
            bytes_accessed=2 * (bj * (b // tile_i) * r * d
                                + b * bj // tile_i * t * d),
            transcendentals=2 * b * bj * t * r,
        ),
        interpret=interpret,
    )(words, img, valid)


def _call_dimg(words, img, valid, g, gamma1, gamma2, tile_i, mm_dtype,
               interpret):
    b, t, d = words.shape
    bj, r, _ = img.shape
    grid = (bj, b // tile_i)  # image-major: d_img[j] accumulates over i
    return pl.pallas_call(
        functools.partial(_dimg_kernel, gamma1, gamma2, mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, t, d), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, d), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, t), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, bj), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, d), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bj, r, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * bj * t * r * d,
            bytes_accessed=4 * bj * b // tile_i * r * d,
            transcendentals=4 * b * bj * t * r,
        ),
        interpret=interpret,
    )(words, img, valid, g)


def _call_dwords(words, img, valid, g, gamma1, gamma2, tile_i, mm_dtype,
                 interpret):
    b, t, d = words.shape
    bj, r, _ = img.shape
    grid = (b // tile_i, bj)  # text-major: d_words[i] accumulates over j
    return pl.pallas_call(
        functools.partial(_dwords_kernel, gamma1, gamma2, mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, t), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, bj), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, t, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * bj * t * r * d,
            bytes_accessed=4 * b * bj // tile_i * t * d,
            transcendentals=4 * b * bj * t * r,
        ),
        interpret=interpret,
    )(words, img, valid, g)


# --------------------------------------------------------------------------
# custom VJP
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _damsm_sim(words, img, valid, gamma1, gamma2, tile_i, mm_dtype,
               interpret):
    return _call_fwd(words, img, valid, gamma1, gamma2, tile_i, mm_dtype,
                     interpret)


def _sim_fwd(words, img, valid, gamma1, gamma2, tile_i, mm_dtype,
             interpret):
    sim = _call_fwd(words, img, valid, gamma1, gamma2, tile_i, mm_dtype,
                    interpret)
    return sim, (words, img, valid)


def _sim_bwd(gamma1, gamma2, tile_i, mm_dtype, interpret, res, g):
    words, img, valid = res
    g = g.astype(jnp.float32)
    d_img = _call_dimg(words, img, valid, g, gamma1, gamma2, tile_i,
                       mm_dtype, interpret)
    d_words = _call_dwords(words, img, valid, g, gamma1, gamma2, tile_i,
                           mm_dtype, interpret)
    return d_words.astype(words.dtype), d_img.astype(img.dtype), None


_damsm_sim.defvjp(_sim_fwd, _sim_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------
def damsm_sim(
    words: jax.Array,
    img: jax.Array,
    cap_lens: jax.Array,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    *,
    tile_i: int = 16,
    mm_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """sim[i, j] = Eq.10 similarity of text i against image j.

    words (B, T, D) f32, img (B_img, R, D) f32, cap_lens (B,) int.
    Returns (B, B_img) f32.  Requires B % tile_i == 0 (caller falls back
    to the XLA path otherwise)."""
    b, t, _ = words.shape
    valid = (jnp.arange(t)[None, :] < cap_lens[:, None]).astype(jnp.int32)
    return _damsm_sim(
        words.astype(jnp.float32), img.astype(jnp.float32), valid,
        float(gamma1), float(gamma2), tile_i, mm_dtype, interpret,
    )
