"""Progressive text-conditioned StyleGAN (legacy gen-1 capability).

Capability parity with the reference's first generation
(Old_Code/model.py:269-584, Old_Code/train.py): a StyleGAN generator grown
from 4x4 with per-resolution to-RGB heads and alpha fade-in, a progressive
discriminator with minibatch-stddev, and style conditioning on the text
embedding.

TPU-first redesign (vs the reference's dynamic-resolution torch graph):

* the resolution index (``step``) is a **static** argument — each active
  resolution is its own jitted XLA program with fixed shapes; only the
  fade-in ``alpha`` is traced.  Phase switches recompile once per
  resolution (a handful over a run) instead of forcing dynamic shapes.
* equalized-LR is runtime weight scaling (models/legacy_style.py), fused by
  XLA into the convs; the reference's forward-pre-hook machinery and the
  hand-written double-backward Blur autograd disappear.
* text conditioning: the sentence embedding is PixelNorm'd and concatenated
  to z before the style MLP (the reference's TextProcess pipes BERT output
  through a linear + PixelNorm into the style input,
  Old_Code/model.py:828-840).

Style mixing: pass ``z`` shaped (2, B, Z) and a ``crossover`` block index —
blocks >= crossover use the second style (mixing regularization,
Old_Code/train.py:224-237).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sba_gan_tpu.models.legacy_style import (
    Blur4Tap,
    ConstantInput,
    EqualizedConv,
    EqualizedDense,
    NoiseInjection,
    PixelNorm,
    minibatch_stddev,
)

Dtype = Any


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


class StyleAdaIN(nn.Module):
    """AdaIN with equalized-LR style affine (reference AdaptiveInstanceNorm,
    Old_Code/model.py:269-286: scale init so style starts at identity)."""

    features: int

    @nn.compact
    def __call__(self, h, w_code):
        style = EqualizedDense(self.features * 2, name="style")(w_code)
        gamma, beta = jnp.split(style, 2, axis=-1)
        from sba_gan_tpu.models.blocks import instance_norm_2d

        out = instance_norm_2d(h)
        return (gamma[:, None, None, :] + 1.0) * out + beta[:, None, None, :]


class StyledConvBlock(nn.Module):
    """One progressive block: [up2x + blur] conv-noise-lrelu-AdaIN x2
    (reference StyledConvBlock, Old_Code/model.py:313-375)."""

    features: int
    initial: bool = False
    upsample: bool = True

    @nn.compact
    def __call__(self, h, w_code, rng):
        r1, r2 = jax.random.split(rng)
        if self.initial:
            h = ConstantInput(self.features, name="const")(w_code.shape[0])
        else:
            if self.upsample:
                b, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = Blur4Tap(name="blur")(h)
            h = EqualizedConv(self.features, (3, 3), name="conv1")(h)
        h = NoiseInjection(name="noise1")(h, r1)
        h = _leaky(h)
        h = StyleAdaIN(self.features, name="adain1")(h, w_code)
        h = EqualizedConv(self.features, (3, 3), name="conv2")(h)
        h = NoiseInjection(name="noise2")(h, r2)
        h = _leaky(h)
        h = StyleAdaIN(self.features, name="adain2")(h, w_code)
        return h


def _channels(block_idx: int, fmap_base: int = 512, fmap_max: int = 512) -> int:
    """512, 512, 512, 512, 256, 128, 64, 32, 16 for 4x4..1024x1024."""
    return min(fmap_max, int(fmap_base / (2 ** max(0, block_idx - 3))))


class StyledGenerator(nn.Module):
    """Progressive synthesis up to ``max_resolution``.

    __call__(z, sent_emb, step, alpha, rng, crossover=None):
      z:        (B, Z) or (2, B, Z) for mixing.
      sent_emb: (B, E) text embedding or None (unconditional).
      step:     static int — output resolution 4 * 2**step.
      alpha:    traced fade-in scalar in [0, 1].
    Returns (B, R, R, 3) image.
    """

    z_dim: int = 128
    w_dim: int = 512
    n_mlp: int = 8
    max_resolution: int = 256
    fmap_max: int = 512

    def n_blocks(self) -> int:
        return int(math.log2(self.max_resolution // 4)) + 1

    @nn.compact
    def __call__(self, z, sent_emb, step: int, alpha, rng,
                 crossover: Optional[int] = None,
                 w_mean=None, style_weight: float = 0.7,
                 return_w: bool = False):
        """``w_mean``/``style_weight``: truncation toward the mean style
        (reference StyledGenerator mean_style/style_weight,
        Old_Code/model.py:484-498, generate.py:26-35).  ``return_w=True``
        short-circuits after the style MLP — used to estimate the mean
        style (generate.py:11-24)."""
        assert 0 <= step < self.n_blocks()
        pn = PixelNorm()

        # declare style-net modules once; both mixing styles share them
        text_proj = (
            EqualizedDense(self.z_dim, name="text_proj")
            if sent_emb is not None
            else None
        )
        mlps = [
            EqualizedDense(self.w_dim, name=f"mlp_{i}")
            for i in range(self.n_mlp)
        ]

        def style(z_one):
            h = pn(z_one)
            if text_proj is not None:
                # TextProcess: linear + PixelNorm on the sentence embedding
                # (Old_Code/model.py:828-840), concatenated into the style in
                h = jnp.concatenate([h, pn(text_proj(sent_emb))], axis=-1)
            for m in mlps:
                h = _leaky(m(h))
            return h

        if z.ndim == 3:  # (2, B, Z) mixing
            w0, w1 = style(z[0]), style(z[1])
        else:
            w0 = w1 = style(z)
        if return_w:
            return w0
        if w_mean is not None:
            # truncation trick: w <- mean + psi * (w - mean)
            w0 = w_mean + style_weight * (w0 - w_mean)
            w1 = w_mean + style_weight * (w1 - w_mean)
        cross = crossover if crossover is not None else self.n_blocks()

        rngs = jax.random.split(rng, step + 1)
        h = None
        out_prev = out = None
        for i in range(step + 1):
            w_code = w0 if i < cross else w1
            h = StyledConvBlock(
                _channels(i, fmap_max=self.fmap_max),
                initial=(i == 0),
                name=f"block_{i}",
            )(h, w_code, rngs[i])
            # every head is materialized on every call so one parameter set
            # serves all resolutions (static-step multi-program design)
            out_prev = out
            out = EqualizedConv(3, (1, 1), name=f"to_rgb_{i}")(h)
        if step > 0:
            skip = jnp.repeat(jnp.repeat(out_prev, 2, axis=1), 2, axis=2)
            out = (1.0 - alpha) * skip + alpha * out
        return out


class ProgressiveDiscriminator(nn.Module):
    """Progressive critic: from_rgb ladder down to 4x4, minibatch stddev,
    equalized head (reference Discriminator, Old_Code/model.py:511-584).
    Returns raw scores (B,) for WGAN/R1 losses."""

    max_resolution: int = 256
    fmap_max: int = 512

    def n_blocks(self) -> int:
        return int(math.log2(self.max_resolution // 4)) + 1

    @nn.compact
    def __call__(self, img, step: int, alpha, sent_emb=None):
        assert 0 <= step < self.n_blocks()

        def down2(x):
            return nn.avg_pool(x, (2, 2), strides=(2, 2))

        # materialize every from_rgb head each call (1x1 convs on a
        # downsampled pyramid) so one parameter set serves all resolutions
        pyramid = img
        from_rgb = {}
        for i in range(step, -1, -1):
            from_rgb[i] = _leaky(
                EqualizedConv(_channels(i, fmap_max=self.fmap_max), (1, 1),
                              name=f"from_rgb_{i}")(pyramid)
            )
            if i > 0:
                pyramid = down2(pyramid)

        h = from_rgb[step]
        for i in range(step, 0, -1):
            ch_out = _channels(i - 1, fmap_max=self.fmap_max)
            h = _leaky(EqualizedConv(_channels(i, fmap_max=self.fmap_max),
                                     (3, 3), name=f"conv_{i}")(h))
            h = Blur4Tap(name=f"blur_{i}")(h)
            h = down2(_leaky(EqualizedConv(ch_out, (3, 3),
                                           name=f"down_{i}")(h)))
            if i == step and step > 0:
                # fade-in skip from the lower-resolution ladder; channels
                # match by construction (from_rgb[i-1] emits _channels(i-1))
                h = (1.0 - alpha) * from_rgb[step - 1] + alpha * h
        # 4x4 head with minibatch stddev (Old_Code/model.py:543-569; the
        # reference computes a sent_emb projection but concatenates only the
        # stddev statistic — replicate the effective behavior)
        h = minibatch_stddev(h)
        h = _leaky(EqualizedConv(_channels(0, fmap_max=self.fmap_max), (3, 3),
                                 name="final_conv")(h))
        h = h.reshape(h.shape[0], -1)
        h = _leaky(EqualizedDense(self.fmap_max, name="final_dense")(h))
        return EqualizedDense(1, name="head")(h)[:, 0].astype(jnp.float32)
