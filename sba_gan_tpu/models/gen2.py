"""Gen-2 conditional StyleGAN stack (SURVEY.md L8), TPU-native.

Capability parity with the reference's second-generation model
(``Old_Code/code/model.py`` + ``Old_Code/code/model_modules.py``): a
*fixed-structure* (non-progressive) StyleGAN ladder conditioned on BERT text,
with per-layer ``Layer_Epilogue`` toggles (noise injection, pixel norm,
instance norm, attention-derived style), the truncation trick, and a
resolution-mirrored discriminator with conditional/unconditional heads.

Reference map (cited file:line):

* ``BERT_EMBEDDING``    — Old_Code/code/model.py:14-45   -> :class:`Gen2TextEncoder`
* ``CA_NET``            — Old_Code/code/model.py:49-90   -> :class:`Gen2CANet`
* ``G_MAPPING``         — Old_Code/code/model.py:92-133  -> :class:`Gen2Mapping`
* ``Layer_Epilogue``    — Old_Code/code/model.py:135-188 -> :class:`LayerEpilogue`
* ``G_BLOCK``           — Old_Code/code/model.py:190-257 -> :class:`Gen2GBlock`
* ``G_NET``             — Old_Code/code/model.py:259-385 -> :class:`Gen2Generator`
* ``D_BLOCK/D_GET_OUTPUT/D_NET`` — Old_Code/code/model.py:388-522
                        -> :class:`Gen2DBlock`/:class:`Gen2DOutput`/:class:`Gen2Discriminator`
* ``IMAGE_ENCODER``     — Old_Code/code/model.py:523-541 -> :class:`Gen2ImageEncoder`
* ``Apply_Noise/Apply_Style/GlobalAttentionGeneral/Pixel_Norm/Instance_Norm``
                        — Old_Code/code/model_modules.py:25-298

Deliberate deviations (each marked below): NHWC layout; heads return logits
(sigmoid folded into BCE-with-logits — same math); ``ConvTranspose`` uses
XLA 'SAME' padding (torch k=4/s=2/p=1 and SAME both give exactly 2x output).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import instance_norm_2d
from .inception import InceptionV3Backbone, resize_bilinear_align_corners
from .legacy_style import PixelNorm
from .text_bert import BERT_BASE, BertModel

Dtype = Any


def nf(res_log2: int, fmap_base: int = 4096, fmap_decay: float = 1.0,
       fmap_max: int = 256) -> int:
    """Feature-map count at a resolution rung (Old_Code/code/model.py:272)."""
    return min(int(fmap_base / (2.0 ** (res_log2 * fmap_decay))), fmap_max)


def _leaky(x):
    return nn.leaky_relu(x, 0.2)


class Gen2ApplyNoise(nn.Module):
    """Per-channel zero-init noise injection (model_modules.py:55-66)."""

    @nn.compact
    def __call__(self, x, rng):
        w = self.param("weight", nn.initializers.zeros, (x.shape[-1],))
        noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        return x + w.astype(x.dtype) * noise


class Gen2AttentionStyle(nn.Module):
    """Gen-2 GlobalAttentionGeneral (model_modules.py:231-298): word-attention
    over the feature map reduced to a per-sample style code.

    h (B,H,W,C) queries the word table (B,T,word_dim): 1x1-projected words,
    softmax over words per pixel, word-weighted context map, then a 1x1 conv
    to a single channel and a Dense over the flattened H*W map -> a_dim code.
    The reference never applies a pad mask here (``self.mask`` stays None in
    the gen-2 generator), so none is taken.
    """

    a_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, words):
        b, ih, iw, c = h.shape
        query_l = ih * iw
        # conv_context: 1x1, word_dim -> C, no bias (model_modules.py:242)
        source = nn.Dense(c, use_bias=False, dtype=self.dtype,
                          name="conv_context")(words)  # (B,T,C)
        target = h.reshape(b, query_l, c)
        attn = jnp.einsum("bqc,btc->bqt", target, source)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bqt,btc->bqc", attn, source).reshape(b, ih, iw, c)
        ctx = nn.Dense(1, use_bias=False, dtype=self.dtype, name="conv")(ctx)
        ctx = ctx.reshape(b, query_l)
        return nn.Dense(self.a_dim, dtype=self.dtype, name="att_fc")(ctx)


class Gen2ApplyStyle(nn.Module):
    """Style modulation x*(s0+1)+s1 with style from w (optionally concat an
    attention code) (model_modules.py:69-114)."""

    a_dim: int
    use_attn: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w_code, words):
        c = x.shape[-1]
        if self.use_attn:
            attn_code = Gen2AttentionStyle(self.a_dim, dtype=self.dtype,
                                           name="attn")(x, words)
            style_in = jnp.concatenate(
                [attn_code, w_code.astype(attn_code.dtype)], axis=-1)
        else:
            style_in = w_code
        style = nn.Dense(c * 2, dtype=self.dtype, name="fc")(style_in)
        style = _leaky(style)
        scale, shift = style[:, :c], style[:, c:]
        return (x * (scale[:, None, None, :] + 1.0)
                + shift[:, None, None, :])


class LayerEpilogue(nn.Module):
    """noise -> leaky -> [pixel_norm] -> [instance_norm] -> apply_style
    (Old_Code/code/model.py:135-188).  Gen-2's Instance_Norm uses eps=1e-8
    (model_modules.py:40-52)."""

    a_dim: int
    use_attn: bool = True
    use_noise: bool = True
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w_code, words, rng):
        if self.use_noise:
            x = Gen2ApplyNoise(name="apply_noise")(x, rng)
        x = _leaky(x)
        if self.use_pixel_norm:
            x = PixelNorm()(x)
        if self.use_instance_norm:
            x = instance_norm_2d(x, eps=1e-8)
        return Gen2ApplyStyle(self.a_dim, self.use_attn, dtype=self.dtype,
                              name="apply_style")(x, w_code, words)


class Gen2GBlock(nn.Module):
    """Upsample + two (epilogue, conv) pairs at one resolution rung
    (Old_Code/code/model.py:190-257).  Upsample is bilinear align-corners
    when the channel count is unchanged, else a 4x4/s2 transposed conv."""

    resolution: int
    a_dim: int
    use_attn: bool = True
    use_noise: bool = True
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    fmap_base: int = 4096
    fmap_max: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w_pair, words, rng):
        log2 = int(math.log2(self.resolution))
        channels = nf(log2, self.fmap_base, fmap_max=self.fmap_max)
        kw = dict(a_dim=self.a_dim, use_attn=self.use_attn,
                  use_noise=self.use_noise,
                  use_pixel_norm=self.use_pixel_norm,
                  use_instance_norm=self.use_instance_norm, dtype=self.dtype)
        if nf(log2 - 1, self.fmap_base, fmap_max=self.fmap_max) == channels:
            b, h, w, c = x.shape
            x = resize_bilinear_align_corners(x, (h * 2, w * 2))
        else:
            # deviation: 'SAME' padding — identical 2x output extent as
            # torch ConvTranspose2d(k=4, s=2, p=1) (model.py:222)
            x = nn.ConvTranspose(channels, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name="up_conv")(x)
        r1, r2 = jax.random.split(rng)
        x = LayerEpilogue(**kw, name="adaIN1")(x, w_pair[:, 0], words, r1)
        x = nn.Conv(channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = LayerEpilogue(**kw, name="adaIN2")(x, w_pair[:, 1], words, r2)
        return x


class Gen2TextEncoder(nn.Module):
    """Gen-2 BERT_EMBEDDING (Old_Code/code/model.py:14-45): BERT with the
    transformer frozen (see :func:`gen2_trainable_mask`); raw 768-d word
    states pass through untouched, the pooled output maps to e_dim.

    Returns (words_embs (B,T,768), sent_emb (B,e_dim)).  The reference emits
    words as (B,768,T); we keep (B,T,768) — NHWC-style token-major layout.
    """

    e_dim: int = 128
    bert_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        c = dict(self.bert_cfg or BERT_BASE)
        mask = (tokens != 0).astype(jnp.int32)  # model.py:39
        hidden, pooled = BertModel(c, dtype=self.dtype, name="bert")(
            tokens, mask)
        sent = nn.Dense(self.e_dim, dtype=self.dtype, name="fc")(pooled)
        return hidden.astype(jnp.float32), sent.astype(jnp.float32)


class Gen2CANet(nn.Module):
    """Gen-2 conditioning augmentation (Old_Code/code/model.py:49-90):
    Dense(e_dim -> 4*c_dim) + GLU -> (mu, logvar) -> reparameterized c."""

    c_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sent_emb, rng):
        x = nn.Dense(self.c_dim * 4, dtype=self.dtype, name="fc")(sent_emb)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU (model_modules.py:11-22)
        mu, logvar = x[:, : self.c_dim], x[:, self.c_dim:]
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        eps = jax.random.normal(rng, std.shape, jnp.float32)
        c = (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)
        return c, mu, logvar


class Gen2Mapping(nn.Module):
    """Gen-2 G_MAPPING (Old_Code/code/model.py:92-133): optional PixelNorm on
    z, concat(c, z), then M.LAYERS plain Dense layers (the reference stacks
    linears with *no* nonlinearity between them — reproduced faithfully)."""

    w_dim: int = 256
    num_layers: int = 8
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c_code, z_code):
        if self.use_norm:
            z_code = PixelNorm()(z_code)
        w = jnp.concatenate([c_code, z_code.astype(c_code.dtype)], axis=-1)
        for i in range(self.num_layers):
            w = nn.Dense(self.w_dim, dtype=self.dtype, name=f"fc_{i}")(w)
        return w


class Gen2Generator(nn.Module):
    """Gen-2 G_NET (Old_Code/code/model.py:259-385): learned-constant start,
    per-layer epilogues driven by a broadcast (optionally truncated) w, a
    fixed ladder of G_BLOCKs up to ``resolution``, 1x1 to-RGB (no tanh —
    the reference's tanh is commented out at model.py:381-382).

    __call__(tokens, z, rng, train) ->
        (img (B,R,R,3), words_embs, sent_emb, mu, logvar)
    """

    resolution: int = 128
    resolution_init: int = 4
    e_dim: int = 128
    c_dim: int = 128
    w_dim: int = 256
    a_dim: int = 256
    m_layers: int = 8
    m_use_norm: bool = True
    use_attn: bool = False
    use_noise: bool = False
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    use_truncation: bool = False
    truncation_psi: float = 0.7
    truncation_cutoff: int = 8
    fmap_base: int = 4096
    fmap_max: int = 256
    bert_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, z_code, rng, train: bool = True):
        del train  # no batch-stat modules in the gen-2 generator
        log2 = int(math.log2(self.resolution))
        log2_init = int(math.log2(self.resolution_init))
        num_layers = (log2 - log2_init + 1) * 2
        c_init = nf(log2_init, self.fmap_base, fmap_max=self.fmap_max)

        words, sent = Gen2TextEncoder(self.e_dim, self.bert_cfg,
                                      dtype=self.dtype,
                                      name="bert_embedding")(tokens)
        rng, ca_rng = jax.random.split(rng)
        c_code, mu, logvar = Gen2CANet(self.c_dim, dtype=self.dtype,
                                       name="ca_net")(sent, ca_rng)
        w = Gen2Mapping(self.w_dim, self.m_layers, self.m_use_norm,
                        dtype=self.dtype, name="mapping")(c_code, z_code)
        w = jnp.broadcast_to(w[:, None, :],
                             (w.shape[0], num_layers, self.w_dim))
        if self.use_truncation:  # model.py:368-374
            coefs = jnp.where(jnp.arange(num_layers) < self.truncation_cutoff,
                              self.truncation_psi, 1.0)
            w = w * coefs[None, :, None].astype(w.dtype)

        const = self.param("const", nn.initializers.ones,
                           (1, self.resolution_init, self.resolution_init,
                            c_init))
        bias = self.param("bias", nn.initializers.ones, (c_init,))
        x = jnp.broadcast_to(const, (tokens.shape[0],) + const.shape[1:])
        x = (x + bias[None, None, None, :]).astype(self.dtype)
        x = _leaky(x)

        kw = dict(a_dim=self.a_dim, use_attn=self.use_attn,
                  use_noise=self.use_noise,
                  use_pixel_norm=self.use_pixel_norm,
                  use_instance_norm=self.use_instance_norm, dtype=self.dtype)
        rng, r1, r2 = jax.random.split(rng, 3)
        x = LayerEpilogue(**kw, name="adaIN1")(x, w[:, 0], words, r1)
        x = nn.Conv(c_init, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = LayerEpilogue(**kw, name="adaIN2")(x, w[:, 1], words, r2)

        for i, rung in enumerate(range(log2_init + 1, log2 + 1)):
            rng, block_rng = jax.random.split(rng)
            x = Gen2GBlock(2 ** rung, fmap_base=self.fmap_base,
                           fmap_max=self.fmap_max,
                           **kw, name=f"block_{i}")(
                x, w[:, (i * 2 + 2):(i * 2 + 4)], words, block_rng)

        img = nn.Conv(3, (1, 1), dtype=self.dtype, name="torgb")(x)
        return (img.astype(jnp.float32), words, sent, mu, logvar)


class Gen2DBlock(nn.Module):
    """conv3x3+leaky then downsample+leaky (Old_Code/code/model.py:388-425);
    downsample is avg-pool when channels are unchanged at the next rung,
    else a 2x2/s2 conv."""

    resolution: int
    fmap_base: int = 4096
    fmap_max: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        log2 = int(math.log2(self.resolution))
        channels = nf(log2, self.fmap_base, fmap_max=self.fmap_max)
        down = nf(log2 - 1, self.fmap_base, fmap_max=self.fmap_max)
        x = _leaky(nn.Conv(channels, (3, 3), padding=1, dtype=self.dtype,
                           name="conv")(x))
        if down == channels:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            x = nn.Conv(down, (2, 2), strides=(2, 2), dtype=self.dtype,
                        name="down_conv")(x)
        return _leaky(x)


class Gen2DOutput(nn.Module):
    """Gen-2 D_GET_OUTPUT (Old_Code/code/model.py:427-476): optional
    sentence-conditioned 1x1 joint conv, global average pool, Dense -> 1.

    deviation: always returns the raw score; in BCE mode the sigmoid is
    folded into BCE-with-logits in losses/gen2.py (same math as the
    reference's Sigmoid + BCELoss)."""

    e_dim: int
    condition: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, c_code=None):
        if self.condition and c_code is not None:
            b, ih, iw, _ = h.shape
            c = jnp.broadcast_to(c_code[:, None, None, :],
                                 (b, ih, iw, self.e_dim)).astype(h.dtype)
            h = jnp.concatenate([h, c], axis=-1)
            h = _leaky(nn.Conv(h.shape[-1] - self.e_dim, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name="intermediate")(h))
        pooled = jnp.mean(h, axis=(1, 2))
        return nn.Dense(1, dtype=self.dtype, name="fc")(pooled)


class Gen2Discriminator(nn.Module):
    """Gen-2 D_NET (Old_Code/code/model.py:478-522): from-RGB then D_BLOCKs
    from ``resolution`` down to ``resolution_init``; returns the feature map
    consumed by the cond/uncond heads (heads are separate modules so the
    trainer can share features across them, like the reference)."""

    resolution: int = 128
    resolution_init: int = 4
    fmap_base: int = 4096
    fmap_max: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        log2 = int(math.log2(self.resolution))
        log2_init = int(math.log2(self.resolution_init))
        x = _leaky(nn.Conv(nf(log2, self.fmap_base, fmap_max=self.fmap_max),
                           (1, 1), dtype=self.dtype, name="fromrgb")(img))
        for i, rung in enumerate(range(log2, log2_init, -1)):
            x = Gen2DBlock(2 ** rung, self.fmap_base, self.fmap_max,
                           dtype=self.dtype, name=f"block_{i}")(x)
        return x


class Gen2ImageEncoder(nn.Module):
    """Gen-2 IMAGE_ENCODER (Old_Code/code/model.py:523-541): frozen
    Inception-v3, pooled 2048 features -> Dense(e_dim)."""

    e_dim: int = 128
    input_size: int = 299
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] != self.input_size or x.shape[2] != self.input_size:
            x = resize_bilinear_align_corners(
                x, (self.input_size, self.input_size))
        _, pooled = InceptionV3Backbone(dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train)
        return nn.Dense(self.e_dim, dtype=self.dtype,
                        name="fc")(pooled).astype(jnp.float32)


def gen2_trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where a Gen2Generator parameter trains.  The reference freezes
    the BERT transformer inside BERT_EMBEDDING (child 0; model.py:294-297)
    and trains everything else, including BERT_EMBEDDING.fc."""

    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)

    out = {}
    for k, v in params.items():
        if k == "bert_embedding":
            out[k] = {bk: fill(bv, bk != "bert") for bk, bv in v.items()}
        else:
            out[k] = fill(v, True)
    return out


def gen2_image_encoder_trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """Only the e_dim projection trains; Inception stays frozen
    (model.py:526-528)."""

    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)

    return {k: fill(v, k == "fc") for k, v in params.items()}
