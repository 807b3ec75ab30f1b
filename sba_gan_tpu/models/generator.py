"""Multi-stage attentional generator with AdaIN style injection, TPU-native.

Capability parity with the reference generator stack
(AttnGAN2/code/model.py:342-536 and model_bert.py:370-620):

* :class:`InitStageG` — FC + BN + GLU -> 4x4 -> four up-blocks -> 64x64.
  ``z_concat=True`` matches model.py:363-383 (stage-0 input is concat(c, z));
  ``z_concat=False`` matches model_bert.py:401-420 (c only; z enters via w).
* :class:`NextStageG` — word attention + AdaIN + residual trunk + upsample
  (model.py:386-423).
* :class:`GNet` — CA net + mapping net + 1-3 branches with per-branch RGB
  heads (model.py:440-492).  ``style_mixing=True`` reproduces G_NET_MIX
  (model_bert.py:485-541): z is (2, B, Z) and the two w codes are injected
  into stage 2 / stage 3 respectively.
* :class:`GDCGAN` — single RGB head variant (model.py:496-536).

All modules are NHWC / channels-last; word embeddings are (B, T, D).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sba_gan_tpu.models.attention import WordAttention
from sba_gan_tpu.models.blocks import (
    AdaINNorm,
    BatchNorm,
    CANet,
    Conv3x3,
    MappingNet,
    ResBlock,
    UpBlock,
    glu,
    ortho_init,
)

Dtype = Any


class InitStageG(nn.Module):
    """Stage 0: (z, c) -> 64x64 feature map (reference INIT_STAGE_G)."""

    ngf: int  # equals 16 * cfg.GAN.GF_DIM
    z_concat: bool = True
    dtype: Dtype = jnp.float32
    up_fused: bool = False  # cfg.JAX.UPBLOCK_FUSED
    up_impl: str = "phase3x3"  # cfg.JAX.UPBLOCK_FUSED_IMPL
    bn_compact: Any = False  # cfg.JAX.BN_COMPACT (False | True | "large")

    @nn.compact
    def __call__(self, z_code, c_code, train: bool = True):
        if self.z_concat:
            x = jnp.concatenate([c_code, z_code], axis=1)
        else:
            x = c_code
        x = nn.Dense(
            self.ngf * 4 * 4 * 2,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(x)
        x = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(x, train)
        x = glu(x)
        # Reference reshapes to NCHW (B, ngf, 4, 4) (model.py:373); keep the
        # same channel<->position mapping, then go channels-last.
        x = x.reshape(-1, self.ngf, 4, 4).transpose(0, 2, 3, 1)
        for div in (2, 4, 8, 16):
            x = UpBlock(self.ngf // div, dtype=self.dtype,
                        fused=self.up_fused, fused_impl=self.up_impl,
                        bn_compact=self.bn_compact)(x, train)
        return x  # (B, 64, 64, ngf/16)


class NextStageG(nn.Module):
    """Refinement stage: attention + AdaIN + ResBlocks + 2x upsample
    (reference NEXT_STAGE_G, model.py:386-423)."""

    ngf: int
    num_residual: int = 2
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32
    up_fused: bool = False
    up_impl: str = "phase3x3"
    bn_compact: Any = False  # False | True | "large"
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT

    @nn.compact
    def __call__(self, h_code, c_code, w_code, word_embs, pad_mask, train=True):
        # attention queries the *pre-AdaIN* features (model.py:416-417).
        ctx, att = WordAttention(self.ngf, dtype=self.dtype, impl=self.attn_impl)(
            h_code, word_embs, pad_mask
        )
        h_styled = AdaINNorm(self.ngf, dtype=self.dtype,
                             compact=self.bn_compact)(h_code, w_code)
        h = jnp.concatenate([h_styled, ctx], axis=-1)  # (B, H, W, 2*ngf)
        for _ in range(self.num_residual):
            h = ResBlock(self.ngf * 2, dtype=self.dtype,
                         bn_compact=self.bn_compact,
                         wgrad_dot=self.wgrad_dot)(h, train)
        h = UpBlock(self.ngf, dtype=self.dtype, fused=self.up_fused,
                    fused_impl=self.up_impl,
                    bn_compact=self.bn_compact)(h, train)
        return h, att


class GetImageG(nn.Module):
    """To-RGB head: conv3x3 -> tanh (reference GET_IMAGE_G, model.py:426-437).

    ``pad_lanes`` (cfg.JAX.RGB_HEAD_PAD): compute the conv at N zero-padded
    output channels and slice back to 3 — exact math, identical parameter
    tree (models/blocks.py _LanePaddedConv3x3).  Cout=3 leaves the MXU lane
    dimension 3/128 occupied; the r4 trace showed each head's backward at
    ~3x its forward (5.3 ms vs 1.8 ms at 256^2) from exactly that."""

    dtype: Dtype = jnp.float32
    pad_lanes: int = 0

    @nn.compact
    def __call__(self, h):
        conv = Conv3x3(3, dtype=self.dtype, out_pad=self.pad_lanes)
        return jnp.tanh(conv(h).astype(jnp.float32))


class GNet(nn.Module):
    """Tree generator (reference G_NET / G_NET_MIX).

    __call__ args:
      z:        (B, Z) noise, or (2, B, Z) when style_mixing.
      sent_emb: (B, nef) sentence embedding.
      word_embs:(B, T, nef) word embeddings.
      pad_mask: (B, T) bool, True == padding.
      rng:      PRNG key for the CA-net reparameterization.

    Returns (fake_imgs[list of (B,S,S,3)], att_maps, mu, logvar).
    """

    gf_dim: int  # cfg.GAN.GF_DIM
    condition_dim: int  # cfg.GAN.CONDITION_DIM
    w_dim: int  # cfg.GAN.W_DIM
    branch_num: int = 3
    num_residual: int = 2  # cfg.GAN.R_NUM
    mapping_layers: int = 6  # cfg.GAN.M_NUM
    z_concat: bool = True  # cfg.GAN.INIT_Z_CONCAT
    style_mixing: bool = False  # cfg.TRAIN.MIXING
    attn_impl: str = "auto"  # word-attention kernel selection (cfg.JAX.USE_PALLAS)
    up_fused: bool = False  # cfg.JAX.UPBLOCK_FUSED
    up_impl: str = "phase3x3"  # cfg.JAX.UPBLOCK_FUSED_IMPL
    bn_compact: Any = False  # cfg.JAX.BN_COMPACT (False | True | "large")
    rgb_pad: int = 0  # cfg.JAX.RGB_HEAD_PAD
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, sent_emb, word_embs, pad_mask, rng, train: bool = True):
        ngf = self.gf_dim
        fake_imgs: List[jax.Array] = []
        att_maps: List[jax.Array] = []

        c_code, mu, logvar = CANet(self.condition_dim, dtype=self.dtype)(
            sent_emb, rng
        )
        mapping = MappingNet(
            self.w_dim, num_layers=self.mapping_layers, dtype=self.dtype
        )
        if self.style_mixing:
            # G_NET_MIX (model_bert.py:517-519): two w codes from two z draws;
            # stage 0 never sees z (z_concat must be False in this variant).
            w_code2 = mapping(z[0])
            w_code3 = mapping(z[1])
            z0 = z[0]
        else:
            w_code2 = w_code3 = mapping(z)
            z0 = z

        # Stage-boundary activations are tagged for the per-stage remat
        # policy (cfg.JAX.REMAT_GENERATOR_MODE='stages',
        # train/gan.py): jax.checkpoint(..., save_only_these_names
        # ('g_stage')) keeps ONLY these small (B,H,W,C) boundary tensors
        # and recomputes within-stage activations in the backward pass —
        # near full-remat memory savings at a fraction of the recompute.
        from jax.ad_checkpoint import checkpoint_name

        c_code = checkpoint_name(c_code, "g_stage")
        w_code2 = checkpoint_name(w_code2, "g_stage")
        w_code3 = checkpoint_name(w_code3, "g_stage")
        if self.branch_num > 0:
            h1 = InitStageG(ngf * 16, z_concat=self.z_concat,
                            dtype=self.dtype, up_fused=self.up_fused,
                            up_impl=self.up_impl,
                            bn_compact=self.bn_compact)(
                z0, c_code, train
            )
            h1 = checkpoint_name(h1, "g_stage")
            fake_imgs.append(GetImageG(dtype=self.dtype, pad_lanes=self.rgb_pad)(h1))
        if self.branch_num > 1:
            h2, att1 = NextStageG(
                ngf, num_residual=self.num_residual,
                attn_impl=self.attn_impl, dtype=self.dtype,
                up_fused=self.up_fused, up_impl=self.up_impl,
                bn_compact=self.bn_compact, wgrad_dot=self.wgrad_dot,
            )(h1, c_code, w_code2, word_embs, pad_mask, train)
            h2 = checkpoint_name(h2, "g_stage")
            fake_imgs.append(GetImageG(dtype=self.dtype, pad_lanes=self.rgb_pad)(h2))
            att_maps.append(att1)
        if self.branch_num > 2:
            h3, att2 = NextStageG(
                ngf, num_residual=self.num_residual,
                attn_impl=self.attn_impl, dtype=self.dtype,
                up_fused=self.up_fused, up_impl=self.up_impl,
                bn_compact=self.bn_compact, wgrad_dot=self.wgrad_dot,
            )(h2, c_code, w_code3, word_embs, pad_mask, train)
            h3 = checkpoint_name(h3, "g_stage")
            fake_imgs.append(GetImageG(dtype=self.dtype, pad_lanes=self.rgb_pad)(h3))
            att_maps.append(att2)

        return fake_imgs, att_maps, mu, logvar


class GDCGAN(nn.Module):
    """Single-RGB-head variant (reference G_DCGAN, model.py:496-536):
    shared trunk through the branches, one image at the final resolution."""

    gf_dim: int
    condition_dim: int
    w_dim: int
    branch_num: int = 3
    num_residual: int = 2
    mapping_layers: int = 6
    z_concat: bool = True
    attn_impl: str = "auto"
    up_fused: bool = False
    up_impl: str = "phase3x3"
    bn_compact: Any = False  # False | True | "large"
    rgb_pad: int = 0  # cfg.JAX.RGB_HEAD_PAD
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, sent_emb, word_embs, pad_mask, rng, train: bool = True):
        ngf = self.gf_dim
        att_maps: List[jax.Array] = []
        c_code, mu, logvar = CANet(self.condition_dim, dtype=self.dtype)(
            sent_emb, rng
        )
        # The reference G_DCGAN has no mapping net and its NEXT_STAGE_G
        # signature omits w; keep AdaIN fed by a mapping of z for structural
        # unity (w is unused when num_residual=0 stages are configured as in
        # cfg/bird_attnDCGAN2.yml R_NUM=0).
        w_code = MappingNet(
            self.w_dim, num_layers=self.mapping_layers, dtype=self.dtype
        )(z)
        h = InitStageG(ngf * 16, z_concat=self.z_concat,
                       dtype=self.dtype, up_fused=self.up_fused,
                       up_impl=self.up_impl, bn_compact=self.bn_compact)(
            z, c_code, train
        )
        if self.branch_num > 1:
            h, att1 = NextStageG(
                ngf, num_residual=self.num_residual,
                attn_impl=self.attn_impl, dtype=self.dtype,
                up_fused=self.up_fused, up_impl=self.up_impl,
                bn_compact=self.bn_compact, wgrad_dot=self.wgrad_dot,
            )(h, c_code, w_code, word_embs, pad_mask, train)
            att_maps.append(att1)
        if self.branch_num > 2:
            h, att2 = NextStageG(
                ngf, num_residual=self.num_residual,
                attn_impl=self.attn_impl, dtype=self.dtype,
                up_fused=self.up_fused, up_impl=self.up_impl,
                bn_compact=self.bn_compact, wgrad_dot=self.wgrad_dot,
            )(h, c_code, w_code, word_embs, pad_mask, train)
            att_maps.append(att2)
        fake_img = GetImageG(dtype=self.dtype, pad_lanes=self.rgb_pad)(h)
        return [fake_img], att_maps, mu, logvar


def build_generator(cfg) -> nn.Module:
    """Construct the generator configured by ``cfg`` (mirrors the trainer's
    model selection, reference trainer.py:77-95)."""
    common = dict(
        gf_dim=cfg.GAN.GF_DIM,
        condition_dim=cfg.GAN.CONDITION_DIM,
        w_dim=cfg.GAN.W_DIM,
        branch_num=cfg.TREE.BRANCH_NUM,
        num_residual=cfg.GAN.R_NUM,
        mapping_layers=cfg.GAN.M_NUM,
        z_concat=cfg.GAN.INIT_Z_CONCAT,
        attn_impl="auto" if cfg.JAX.USE_PALLAS else "xla",
        up_fused=cfg.JAX.UPBLOCK_FUSED,
        up_impl=cfg.JAX.UPBLOCK_FUSED_IMPL,
        bn_compact=cfg.JAX.BN_COMPACT,
        rgb_pad=cfg.JAX.RGB_HEAD_PAD,
        wgrad_dot=cfg.JAX.CONV_WGRAD_DOT,
        dtype=jnp.dtype(cfg.JAX.DTYPE),
    )
    if cfg.GAN.B_DCGAN:
        return GDCGAN(**common)
    return GNet(style_mixing=cfg.TRAIN.MIXING, **common)
