"""Legacy StyleGAN components (config-gated extras).

Capability parity with the reference's gen-1/gen-2 StyleGAN stacks
(SURVEY.md L1-L5, Old_Code/model.py and Old_Code/code/model_modules.py),
re-designed for XLA:

* :class:`PixelNorm` — x / sqrt(mean(x^2)+eps) (Old_Code/model.py:116-121).
* :func:`equalized_lr_scale` + :class:`EqualizedDense` /
  :class:`EqualizedConv` — runtime He-constant weight scaling.  The
  reference implements this as a torch forward-pre-hook re-parameterization
  (`EqualLR`, Old_Code/model.py:26-55); functionally identical here as a
  multiply folded into the op, which XLA fuses into the matmul/conv.
* :class:`NoiseInjection` — per-channel learned noise gain
  (Old_Code/model.py:289-296).
* :class:`Blur4Tap` — [1,2,1]x[1,2,1] depthwise blur; the reference needs a
  hand-written double-backward autograd Function (`BlurFunction`,
  Old_Code/model.py:124-164) because torch lacked it — JAX differentiates
  the depthwise conv natively, so the whole custom-autograd apparatus
  disappears.
* :class:`ConstantInput` — learned 4x4 constant (Old_Code/model.py:299-310).
* :func:`minibatch_stddev` — D's 4x4 statistic (Old_Code/model.py:543-554).
  Under a sharded batch the mean over the batch axis is global, so the
  statistic is cross-replica automatically.
* :func:`truncate_w` / :func:`mean_style` — truncation trick psi-lerp toward
  the mean style (Old_Code/generate.py:11-24, gen-2 model.py:311-321).
* :func:`progressive_schedule` — gen-1's resolution/alpha fade-in schedule
  (Old_Code/train.py:142-183) as a pure host-side function; each resolution
  is its own jitted program (static shapes), alpha enters as a traced
  scalar.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PixelNorm(nn.Module):
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        return (x32 * jax.lax.rsqrt(
            jnp.mean(x32 ** 2, axis=-1, keepdims=True) + self.eps
        )).astype(x.dtype)


def equalized_lr_scale(fan_in: int, gain: float = math.sqrt(2.0)) -> float:
    """He-constant applied at runtime (EqualLR semantics)."""
    return gain / math.sqrt(fan_in)


class EqualizedDense(nn.Module):
    features: int
    use_bias: bool = True
    lr_mul: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.normal(1.0 / self.lr_mul),
            (in_dim, self.features),
        )
        scale = equalized_lr_scale(in_dim) * self.lr_mul
        y = x @ (w * scale).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b * self.lr_mul).astype(self.dtype)
        return y


class EqualizedConv(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        in_dim = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.normal(1.0),
            (kh, kw, in_dim, self.features),
        )
        scale = equalized_lr_scale(in_dim * kh * kw)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            (w * scale).astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class NoiseInjection(nn.Module):
    """h + gamma_c * N(0,1) noise image (per-channel learned gain)."""

    @nn.compact
    def __call__(self, x, rng):
        gamma = self.param("weight", nn.initializers.zeros, (x.shape[-1],))
        noise = jax.random.normal(rng, x.shape[:-1] + (1,), jnp.float32)
        return x + (gamma * noise).astype(x.dtype)


class ConstantInput(nn.Module):
    channels: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int):
        c = self.param(
            "input", nn.initializers.normal(1.0),
            (1, self.size, self.size, self.channels),
        )
        return jnp.broadcast_to(c, (batch, self.size, self.size, self.channels))


def blur_4tap(x: jax.Array) -> jax.Array:
    """Depthwise [1,2,1]^T [1,2,1] / 16 blur, NHWC."""
    k1 = jnp.array([1.0, 2.0, 1.0], jnp.float32)
    k = (k1[:, None] * k1[None, :]) / 16.0
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class Blur4Tap(nn.Module):
    @nn.compact
    def __call__(self, x):
        return blur_4tap(x)


def minibatch_stddev(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Append the scalar batch-stddev statistic as an extra channel
    (Old_Code/model.py:543-554).  Reductions over the (possibly sharded)
    batch axis are global under jit."""
    x32 = x.astype(jnp.float32)
    var = jnp.var(x32, axis=0)
    std = jnp.sqrt(var + eps).mean()
    feat = jnp.full(x.shape[:-1] + (1,), std, x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


def mean_style(w: jax.Array) -> jax.Array:
    """Mean style vector over a sample of w codes (generate.py:11-17)."""
    return jnp.mean(w, axis=0, keepdims=True)


def truncate_w(w: jax.Array, w_mean: jax.Array, psi: float = 0.7) -> jax.Array:
    """Truncation trick: w_mean + psi * (w - w_mean) (generate.py:18-24)."""
    return w_mean + psi * (w - w_mean)


def progressive_schedule(
    step: int, phase_samples: int, batch_size: int,
    init_size: int = 8, max_size: int = 64,
) -> Tuple[int, float]:
    """Gen-1's resolution + alpha fade schedule (Old_Code/train.py:142-183)
    for a FIXED batch size.  Under a per-rung batch schedule use
    :func:`progressive_schedule_samples` with the actual samples consumed
    (the reference advances phases by ``used_sample += real_image.shape[0]``,
    Old_Code/train.py:156)."""
    return progressive_schedule_samples(
        step * batch_size, phase_samples, init_size, max_size
    )


def progressive_schedule_samples(
    used: int, phase_samples: int, init_size: int = 8, max_size: int = 64,
) -> Tuple[int, float]:
    """Resolution + alpha from the actual number of samples consumed."""
    n_phases = int(math.log2(max_size / init_size)) + 1
    phase = min(used // phase_samples, n_phases - 1)
    resolution = init_size * (2 ** phase)
    if phase == 0:
        alpha = 1.0
    else:
        alpha = min(1.0, (used - phase * phase_samples) / phase_samples)
    return resolution, alpha
