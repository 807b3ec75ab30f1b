"""Memory-compact normalization cores with hand-written VJPs.

Reference semantics: the torch ``BatchNorm2d`` / ``InstanceNorm2d`` layers
inside the G/D stacks (``AttnGAN2/code/model.py:342-674``).  This module
implements the train-mode normalize as ``y = x*a + b`` with the batch
statistics folded into per-channel (BatchNorm) or per-sample-channel
(InstanceNorm) f32 scale/offset applied in the compute dtype, plus a
``jax.custom_vjp`` backward so the (B,H,W,C) activation is **never
promoted to f32 in either pass**.

Why not flax ``nn.BatchNorm`` + plain AD: its normalize path materializes
``x_f32 - mean`` and saves it as a VJP residual — the two largest HLO
temps of the b256 train-step compile were 4.00 GB f32 buffers from exactly
that promotion (logs/r3_ablations.log 2026-08-19 20:50).  Why not
``jax.checkpoint`` around the stats (the first compact variant): the
rematerialized backward still builds the f32 cast of the whole activation
as a real temp, and nesting under the step's remat policies re-saves
inputs — measured on-chip as a *runtime* ResourceExhausted at the
b128-nochunk operating point that plain flax BN fits
(logs/r3_ablations.log 2026-08-19 22:50).

The hand-written backward is the textbook fused BN gradient.  With
``s1 = sum(dy)`` and ``s2 = sum(dy * x)`` reduced over the stat axes with
f32 accumulation, ``inv = rsqrt(var + eps)`` and ``N`` the stat-axis
element count:

    dscale = (s2 - mean*s1) * inv          # == sum(dy * xhat)
    dbias  = s1
    dx     = dy*c1 + x*c2 + c3
             c1 = inv*scale
             c2 = -c1*inv*dscale/N
             c3 = -c2*mean - c1*s1/N

so the only saved residuals are the compute-dtype input and the
per-channel statistics, and the backward lowers to two fused reductions
plus one fused elementwise combine — speed-of-light for a bandwidth-bound
op.  Parity (values, grads, running stats, bf16 cosine) is pinned in
tests/test_blocks_bn_compact.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _stats(x: jax.Array, red) -> tuple[jax.Array, jax.Array]:
    """f32-accumulated mean / fast variance over ``red`` axes.

    The casts fuse into the reductions; no f32 copy of x is materialized.
    Fast variance E[x^2]-E[x]^2 matches flax nn.BatchNorm's default.
    """
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, red)
    m2 = jnp.mean(jnp.square(xf), red)
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


# ---------------------------------------------------------------------------
# BatchNorm (per-channel stats over all leading axes)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_apply(x, scale, bias, eps):
    """Train-mode BatchNorm returning ``(y, mean, var)``.

    ``mean``/``var`` are provided for the caller's running-stat EMA, which
    carries no gradient — their cotangents are ignored by the custom
    backward (callers must ``stop_gradient`` any use that should not be
    silently non-differentiated).
    """
    return _bn_fwd(x, scale, bias, eps)[0]


def _bn_fwd(x, scale, bias, eps):
    red = tuple(range(x.ndim - 1))
    mean, var = _stats(x, red)
    inv = jax.lax.rsqrt(var + eps) * scale
    a = inv.astype(x.dtype)
    b = (bias - mean * inv).astype(x.dtype)
    y = x * a + b
    return (y, mean, var), (x, scale, mean, var)


def _bn_bwd(eps, res, cts):
    x, scale, mean, var = res
    dy = cts[0]  # cotangents for mean/var are the running-stat EMA's: none
    red = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[i] for i in red]))
    s1 = jnp.sum(dy.astype(jnp.float32), red)
    s2 = jnp.sum(dy.astype(jnp.float32) * x.astype(jnp.float32), red)
    inv = jax.lax.rsqrt(var + eps)
    dscale = (s2 - mean * s1) * inv
    dbias = s1
    c1 = inv * scale
    c2 = -c1 * inv * dscale / n
    c3 = -c2 * mean - c1 * s1 / n
    dx = (dy * c1.astype(dy.dtype) + x * c2.astype(x.dtype)
          + c3.astype(x.dtype))
    return dx.astype(x.dtype), dscale, dbias


bn_train_apply.defvjp(lambda x, s, b, eps: _bn_fwd(x, s, b, eps), _bn_bwd)


# ---------------------------------------------------------------------------
# InstanceNorm (per-sample, per-channel stats over H, W; affine-free)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_train_apply(x, eps):
    """Affine-free InstanceNorm2d over NHWC (stats per sample+channel)."""
    return _in_fwd(x, eps)[0]


def _in_fwd(x, eps):
    mean, var = _stats(x, (1, 2))  # (B, C)
    inv = jax.lax.rsqrt(var + eps)
    a = inv[:, None, None, :].astype(x.dtype)
    b = (-mean * inv)[:, None, None, :].astype(x.dtype)
    return x * a + b, (x, mean, var)


def _in_bwd(eps, res, dy):
    x, mean, var = res
    n = float(x.shape[1] * x.shape[2])
    s1 = jnp.sum(dy.astype(jnp.float32), (1, 2))
    s2 = jnp.sum(dy.astype(jnp.float32) * x.astype(jnp.float32), (1, 2))
    inv = jax.lax.rsqrt(var + eps)
    dsum_xhat = (s2 - mean * s1) * inv
    c1 = inv
    c2 = -inv * inv * dsum_xhat / n
    c3 = -c2 * mean - inv * s1 / n
    dx = (dy * c1[:, None, None, :].astype(dy.dtype)
          + x * c2[:, None, None, :].astype(x.dtype)
          + c3[:, None, None, :].astype(x.dtype))
    return (dx.astype(x.dtype),)


instance_norm_train_apply.defvjp(lambda x, eps: _in_fwd(x, eps), _in_bwd)
