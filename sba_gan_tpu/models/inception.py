"""Inception-v3 image encoder, TPU-native (Flax linen, NHWC).

Capability parity with the reference CNN_ENCODER
(AttnGAN2/code/model.py:162-267): torchvision Inception-v3 backbone, frozen,
with a 17x17x768 region-feature tap after Mixed_6e and a 2048-d global tap
after Mixed_7c, projected to the joint embedding dim by trainable heads
(conv1x1 `emb_features`, linear `emb_cnn_code`).  Input images in [-1, 1] are
bilinearly resized to 299x299 with align_corners=True, exactly as the
reference does (model.py:210).

Module/parameter names mirror torchvision's inception_v3 so released
checkpoints port mechanically (sba_gan_tpu.utils.torch_port); BatchNorm uses
eps=0.001 like torchvision.  Freezing is enforced at the optimizer level
(trainable-parameter filtering), not by the module.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) interpolation-weight matrix for 1-D bilinear resize
    with torch align_corners=True semantics (scale = (in-1)/(out-1))."""
    import numpy as np

    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return jnp.asarray(w)
    pos = np.arange(n_out, dtype=np.float64) * ((n_in - 1) / (n_out - 1))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = (pos - lo).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, lo] = 1.0 - frac
    w[rows, lo + 1] += frac
    return jnp.asarray(w)


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics: the corner
    pixels of input and output coincide (scale = (in-1)/(out-1)).

    TPU-first formulation: separable bilinear resize IS a linear map, so it
    runs as two small matmuls against static weight matrices instead of the
    gather formulation — the MXU does the interpolation, and the VJP is the
    transposed matmul (a gather's transpose is a scatter, which is slow on
    TPU and sat inside the hot DAMSM path: G's gradient flows through this
    resize into Inception every train step, trainer.py:288 damsm loss on
    fakes).  Matmuls run in f32 (XLA-CPU has no bf16 dot; cost is trivial
    next to the adjacent convs) and cast back to the input dtype."""
    b, h, w, c = x.shape
    oh, ow = size
    wy = _resize_matrix(h, oh)
    wx = _resize_matrix(w, ow)
    xf = x.astype(jnp.float32)
    xf = jnp.einsum("bhwc,ph->bpwc", xf, wy)
    xf = jnp.einsum("bhwc,qw->bhqc", xf, wx)
    return xf.astype(x.dtype)


def max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def avg_pool_3x3_s1_pad1(x):
    """torch F.avg_pool2d(k=3, s=1, p=1) with count_include_pad=True:
    constant divisor 9."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, 3, 3, 1),
        (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return (s / 9.0).astype(x.dtype)


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001) + relu (torchvision BasicConv2d).

    ``tag``: checkpoint_name applied to every intermediate (conv out, bn
    out, relu out) — lets a ``save_anything_except_these_names`` remat
    policy exclude exactly this layer's activations from the saved
    residual set (REMAT_IMAGE_ENCODER_MODE='stem', train/gan.py)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32
    tag: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax.ad_checkpoint import checkpoint_name

        name = (lambda v: checkpoint_name(v, self.tag)) if self.tag \
            else (lambda v: v)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = name(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=0.001,
            momentum=0.9,
            dtype=self.dtype,
            name="bn",
        )(x)
        return name(nn.relu(name(x)))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(64, (1, 1), name="branch1x1")(x, train)
        b5 = C(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = C(64, (5, 5), padding=2, name="branch5x5_2")(b5, train)
        b3 = C(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = C(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3, train)
        b3 = C(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3, train)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = C(self.pool_features, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(384, (3, 3), strides=2, name="branch3x3")(x, train)
        bd = C(64, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = C(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd, train)
        bd = C(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd, train)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.channels_7x7
        b1 = C(192, (1, 1), name="branch1x1")(x, train)
        b7 = C(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = C(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7, train)
        b7 = C(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7, train)
        bd = C(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = C(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd, train)
        bd = C(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd, train)
        bd = C(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd, train)
        bd = C(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd, train)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = C(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(192, (1, 1), name="branch3x3_1")(x, train)
        b3 = C(320, (3, 3), strides=2, name="branch3x3_2")(b3, train)
        b7 = C(192, (1, 1), name="branch7x7x3_1")(x, train)
        b7 = C(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7, train)
        b7 = C(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7, train)
        b7 = C(192, (3, 3), strides=2, name="branch7x7x3_4")(b7, train)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(320, (1, 1), name="branch1x1")(x, train)
        b3 = C(384, (1, 1), name="branch3x3_1")(x, train)
        b3a = C(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3, train)
        b3b = C(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = C(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = C(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd, train)
        bda = C(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd, train)
        bdb = C(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = C(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Backbone(nn.Module):
    """Stem through Mixed_7c; returns (mixed_6e (17,17,768), pooled (2048,))."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # checkpoint_name tags are identity outside a jax.checkpoint whose
        # policy matches them; under REMAT_IMAGE_ENCODER_MODE='blocks'
        # (train/gan.py) the tagged Mixed-block outputs become the saved
        # residuals and only the untagged high-res stem is recomputed.
        # The DUAL mode 'stem' keeps everything EXCEPT the 'enc_stem'-tagged
        # stem activations (>= 71x71 — the HBM hog at 299^2..147^2) and
        # recomputes only the stem in the backward: ~0.9 TFLOP at b128
        # instead of the full 1.45 TFLOP encoder recompute.
        from jax.ad_checkpoint import checkpoint_name

        tag = lambda v: checkpoint_name(v, "enc_block")
        stem = lambda v: checkpoint_name(v, "enc_stem")
        C = partial(BasicConv2d, dtype=self.dtype)
        S = partial(BasicConv2d, dtype=self.dtype, tag="enc_stem")
        x = S(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x, train)
        x = S(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = S(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x, train)
        x = stem(max_pool_3x3_s2(x))
        x = S(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = S(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = stem(max_pool_3x3_s2(x))
        x = tag(InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x, train))
        x = tag(InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x, train))
        x = tag(InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x, train))
        x = tag(InceptionB(dtype=self.dtype, name="Mixed_6a")(x, train))
        x = tag(InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x, train))
        x = tag(InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x, train))
        x = tag(InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x, train))
        x = tag(InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x, train))
        features = x  # 17 x 17 x 768 region tap (reference model.py:246)
        x = tag(InceptionD(dtype=self.dtype, name="Mixed_7a")(x, train))
        x = tag(InceptionE(dtype=self.dtype, name="Mixed_7b")(x, train))
        x = tag(InceptionE(dtype=self.dtype, name="Mixed_7c")(x, train))
        pooled = jnp.mean(x, axis=(1, 2))  # avg_pool2d(k=8) (model.py:255)
        return features, pooled


def _uniform01_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -0.1, 0.1)


class CNNEncoder(nn.Module):
    """Reference CNN_ENCODER: backbone taps + trainable projections.

    Returns (region_features (B, 289, nef) flattened row-major from 17x17,
    cnn_code (B, nef))."""

    nef: int = 256
    input_size: int = 299
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] != self.input_size or x.shape[2] != self.input_size:
            x = resize_bilinear_align_corners(
                x, (self.input_size, self.input_size)
            )
            # the 299^2 resized image (f32 when fed f32 fakes) is the
            # single largest stem tensor — exclude it under 'stem' remat
            from jax.ad_checkpoint import checkpoint_name

            x = checkpoint_name(x, "enc_stem")
        x = x.astype(self.dtype)
        features, pooled = InceptionV3Backbone(dtype=self.dtype, name="backbone")(
            x, train
        )
        region = nn.Conv(
            self.nef,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=_uniform01_init,
            name="emb_features",
        )(features)
        b, h, w, d = region.shape
        region = region.reshape(b, h * w, d)
        code = nn.Dense(
            self.nef,
            dtype=self.dtype,
            kernel_init=_uniform01_init,
            name="emb_cnn_code",
        )(pooled)
        return region.astype(jnp.float32), code.astype(jnp.float32)
