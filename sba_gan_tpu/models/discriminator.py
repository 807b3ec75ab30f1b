"""Per-scale discriminators, TPU-native (Flax linen, NHWC).

Capability parity with the reference discriminator stack
(AttnGAN2/code/model.py:581-674): D_NET64/128/256 backbones that encode an
image to a 4x4x8ndf code, plus conditional / unconditional logit heads
(D_GET_LOGITS, model.py:581-607).

One numerically-equivalent deviation: heads return *logits* and the losses
use sigmoid-BCE-from-logits instead of the reference's Sigmoid + BCELoss —
the same math with better numerics and one fewer HBM roundtrip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sba_gan_tpu.models.blocks import (
    Block3x3LeakRelu,
    DownBlock,
    EncodeBy16,
    ortho_init,
)

Dtype = Any


class _HeadsMixin:
    """Shared head plumbing.  `init_all` exercises backbone + both heads so a
    single module.init creates every parameter (linen creates params lazily
    on first use)."""

    def cond_logits(self, h, c, train: bool = True):
        return self.cond_head(h, c, train)

    def uncond_logits(self, h, train: bool = True):
        assert self.uncond_head is not None
        return self.uncond_head(h, train=train)

    def init_all(self, x, c, train: bool = True):
        h = self(x, train)
        cond = self.cond_head(h, c, train)
        uncond = (
            self.uncond_head(h, train=train)
            if self.uncond_head is not None
            else None
        )
        return h, cond, uncond


class DGetLogits(nn.Module):
    """Logit head (reference D_GET_LOGITS).  When conditioned, the sentence
    embedding is tiled over the 4x4 code and mixed by a 3x3 conv block
    (model.py:594-607).  Output: (B,) raw logits."""

    ndf: int
    bcondition: bool = False
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, h_code, c_code=None, train: bool = True):
        if self.bcondition and c_code is not None:
            b, s_h, s_w = h_code.shape[:3]
            c = jnp.broadcast_to(
                c_code[:, None, None, :].astype(h_code.dtype),
                (b, s_h, s_w, c_code.shape[-1]),
            )
            h_c = jnp.concatenate([h_code, c], axis=-1)
            h_c = Block3x3LeakRelu(self.ndf * 8, dtype=self.dtype,
                                   bn_compact=self.bn_compact)(h_c, train)
        else:
            h_c = h_code
        logits = nn.Conv(
            1,
            (4, 4),
            strides=4,
            padding=0,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(h_c)
        return logits.reshape(-1).astype(jnp.float32)


class DNet64(nn.Module, _HeadsMixin):
    """64x64 discriminator backbone (reference D_NET64, model.py:611-625)."""

    ndf: int
    nef: int
    b_jcu: bool = True
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    def setup(self):
        self.backbone = EncodeBy16(self.ndf, dtype=self.dtype,
                                   bn_compact=self.bn_compact)
        self.cond_head = DGetLogits(self.ndf, bcondition=True, dtype=self.dtype,
                                    bn_compact=self.bn_compact)
        self.uncond_head = (
            DGetLogits(self.ndf, bcondition=False, dtype=self.dtype,
                       bn_compact=self.bn_compact)
            if self.b_jcu
            else None
        )

    def __call__(self, x, train: bool = True):
        return self.backbone(x, train)


class DNet128(nn.Module, _HeadsMixin):
    """128x128 discriminator (reference D_NET128, model.py:629-648):
    encode/16 + one extra down block + one 3x3 block back to 8ndf."""

    ndf: int
    nef: int
    b_jcu: bool = True
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    def setup(self):
        self.backbone = EncodeBy16(self.ndf, dtype=self.dtype,
                                   bn_compact=self.bn_compact)
        self.down32 = DownBlock(self.ndf * 16, dtype=self.dtype,
                                bn_compact=self.bn_compact)
        self.block32 = Block3x3LeakRelu(self.ndf * 8, dtype=self.dtype,
                                         bn_compact=self.bn_compact)
        self.cond_head = DGetLogits(self.ndf, bcondition=True, dtype=self.dtype,
                                    bn_compact=self.bn_compact)
        self.uncond_head = (
            DGetLogits(self.ndf, bcondition=False, dtype=self.dtype,
                       bn_compact=self.bn_compact)
            if self.b_jcu
            else None
        )

    def __call__(self, x, train: bool = True):
        h = self.backbone(x, train)
        h = self.down32(h, train)
        return self.block32(h, train)


class DNet256(nn.Module, _HeadsMixin):
    """256x256 discriminator (reference D_NET256, model.py:652-674):
    encode/16 + two down blocks + two 3x3 blocks back to 8ndf."""

    ndf: int
    nef: int
    b_jcu: bool = True
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    def setup(self):
        self.backbone = EncodeBy16(self.ndf, dtype=self.dtype,
                                   bn_compact=self.bn_compact)
        self.down32 = DownBlock(self.ndf * 16, dtype=self.dtype,
                                bn_compact=self.bn_compact)
        self.down64 = DownBlock(self.ndf * 32, dtype=self.dtype,
                                bn_compact=self.bn_compact)
        self.block64_1 = Block3x3LeakRelu(
            self.ndf * 16, dtype=self.dtype, bn_compact=self.bn_compact)
        self.block64_2 = Block3x3LeakRelu(self.ndf * 8, dtype=self.dtype,
                                         bn_compact=self.bn_compact)
        self.cond_head = DGetLogits(self.ndf, bcondition=True, dtype=self.dtype,
                                    bn_compact=self.bn_compact)
        self.uncond_head = (
            DGetLogits(self.ndf, bcondition=False, dtype=self.dtype,
                       bn_compact=self.bn_compact)
            if self.b_jcu
            else None
        )

    def __call__(self, x, train: bool = True):
        h = self.backbone(x, train)
        h = self.down32(h, train)
        h = self.down64(h, train)
        h = self.block64_1(h, train)
        return self.block64_2(h, train)


def build_discriminators(cfg):
    """One discriminator per active branch (reference trainer.py:88-95); the
    DCGAN variant uses a single D at the final scale with no unconditional
    head (trainer.py:77-86)."""
    ndf, nef = cfg.GAN.DF_DIM, cfg.TEXT.EMBEDDING_DIM
    dtype = jnp.dtype(cfg.JAX.DTYPE)
    klass = {1: DNet64, 2: DNet128, 3: DNet256}
    if cfg.GAN.B_DCGAN:
        return [klass[cfg.TREE.BRANCH_NUM](ndf, nef, b_jcu=False, dtype=dtype,
                                           bn_compact=cfg.JAX.BN_COMPACT)]
    return [
        klass[i](ndf, nef, dtype=dtype, bn_compact=cfg.JAX.BN_COMPACT)
        for i in range(1, cfg.TREE.BRANCH_NUM + 1)
    ]
