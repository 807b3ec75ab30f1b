"""Generator/discriminator building blocks, TPU-native (Flax linen, NHWC).

Capability parity with the reference blocks (AttnGAN2/code/model.py:15-71,
271-339, 540-578): GLU, 3x3/1x1 convs, nearest-upsample conv-BN-GLU blocks,
residual blocks, conditioning augmentation, the StyleGAN-style mapping
network, AdaIN style injection, and the leaky-ReLU downsample blocks used by
the discriminators.  Everything is channels-last and static-shape so XLA can
tile convs onto the MXU and fuse the elementwise epilogues.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sba_gan_tpu.ops.norms import bn_train_apply, instance_norm_train_apply

Dtype = Any

# Orthogonal init for conv/linear weights, N(1, 0.02) for norm scales,
# zeros for biases — mirrors the reference `weights_init`
# (miscc/utils.py:286-296).
ortho_init = nn.initializers.orthogonal()


def bn_scale_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype) + 0.02 * jax.random.normal(key, shape, dtype)


def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    """Gated linear unit: split channels in half, a * sigmoid(b)
    (reference GLU, model.py:15-23; channel axis is last in NHWC)."""
    nc = x.shape[axis]
    assert nc % 2 == 0, "channels dont divide 2!"
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def fold_up2x_kernel(k: jax.Array) -> jax.Array:
    """Fold a (3,3,Cin,Cout) kernel into the (2,2,Cin,4*Cout) phase kernels
    of ``conv3x3(nearest_up2(x))`` evaluated at LOW resolution.

    Nearest-2x duplicates every input pixel, so the 3x3 window at output
    pixel (2i+a, 2j+b) only ever touches x rows {i-1, i} (a=0) or {i, i+1}
    (a=1) — with the two taps that land on the same source row summed —
    and likewise for columns.  The four (a, b) phases are stacked on the
    output-channel axis (order 00, 01, 10, 11)."""
    r0 = jnp.stack([k[0], k[1] + k[2]], 0)  # phase a=0: rows {i-1, i}
    r1 = jnp.stack([k[0] + k[1], k[2]], 0)  # phase a=1: rows {i, i+1}

    def cols(kr):
        c0 = jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], 1)
        c1 = jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], 1)
        return c0, c1

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)


def fold_up2x_kernel_phase3x3(k: jax.Array) -> jax.Array:
    """Fold a (3,3,Cin,Cout) kernel into phase-ALIGNED (3,3,Cin,4*Cout)
    kernels of ``conv3x3(nearest_up2(x))`` at LOW resolution.

    Same identity as :func:`fold_up2x_kernel`, but every phase reads the
    SAME centered 3x3 window (rows {i-1, i, i+1}) with structural zeros
    where a phase has no tap — so all four phases come out of one aligned
    'SAME' conv and depth-to-space is a pure reshape/transpose (no shifted
    slices, whose pad-VJPs made the 2x2 form OOM on-chip at b128,
    logs/r3_ablations.log 2026-08-19 19:3x-19:5x)."""
    z = jnp.zeros_like(k[0])
    r0 = jnp.stack([k[0], k[1] + k[2], z], 0)  # phase a=0: rows {i-1, i}
    r1 = jnp.stack([z, k[0] + k[1], k[2]], 0)  # phase a=1: rows {i, i+1}

    def cols(kr):
        zc = jnp.zeros_like(kr[:, 0])
        c0 = jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2], zc], 1)
        c1 = jnp.stack([zc, kr[:, 0] + kr[:, 1], kr[:, 2]], 1)
        return c0, c1

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)


def fold_up2x_kernel_convt(k: jax.Array) -> jax.Array:
    """Fold a (3,3,Cin,Cout) kernel into the (4,4,Cin,Cout) kernel of the
    equivalent stride-2 transposed conv (lhs_dilation=2, padding (2,2)).

    ``nearest_up2`` is a stride-2 transposed conv with a ones(2,2) kernel,
    so ``conv3x3 ∘ nearest_up2`` composes into ONE transposed conv whose
    4-tap-per-axis kernel is the correlation-ready fold
    [k0, k0+k1, k1+k2, k2]: output q gets x[i] * K[2i - q + 2]."""
    r = jnp.stack([k[0], k[0] + k[1], k[1] + k[2], k[2]], 0)  # (4,3,Ci,Co)
    return jnp.stack(
        [r[:, 0], r[:, 0] + r[:, 1], r[:, 1] + r[:, 2], r[:, 2]], 1
    )  # (4,4,Ci,Co)


class _FoldedUpConv3x3(nn.Module):
    """``conv3x3(nearest_up2(x))`` computed at LOW resolution — an exact
    algebraic identity of the reference upBlock's upsample-then-conv
    (AttnGAN2/code/model.py:39-45); only where the FLOPs/bytes happen
    changes.  Three lowerings (cfg.JAX.UPBLOCK_FUSED_IMPL):

    * ``'phase3x3'`` (default) — one aligned 'SAME' 3x3 conv emitting the
      4 output phases as channels (:func:`fold_up2x_kernel_phase3x3`) +
      pure-reshape depth-to-space.  4x fewer MACs than naive (36 per
      low-res pixel vs 144), low-res VJP residual, no shifted slices.
    * ``'convt'`` — ONE stride-2 transposed conv with the folded 4x4
      kernel (:func:`fold_up2x_kernel_convt`): no depth-to-space at all;
      XLA's native lhs-dilated conv path.
    * ``'fold2x2'`` — 2x2 conv + shifted-slice depth-to-space
      (:func:`fold_up2x_kernel`): fewest MACs (16 per low-res pixel) but
      the slice/pad VJP chain RAISED peak HBM on-chip (OOM at b128 where
      naive ran — logs/r3_ablations.log); kept for A/B evidence.

    Holds its kernel at nn.Conv's layout (param 'kernel', shape
    (3,3,Cin,Cout), f32, same init stream) so the parameter tree — and
    therefore checkpoints and the torch importers (utils/torch_port.py)
    — is bit-identical to the unfused path."""

    features: int
    dtype: Dtype = jnp.float32
    impl: str = "phase3x3"

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        co = self.features
        kernel = self.param(
            "kernel", ortho_init, (3, 3, cin, self.features), jnp.float32
        )
        xd = x.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if self.impl == "convt":
            kk = fold_up2x_kernel_convt(kernel).astype(self.dtype)
            return jax.lax.conv_general_dilated(
                xd, kk, window_strides=(1, 1), padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            )  # (b, 2h, 2w, Cout)
        if self.impl == "phase3x3":
            kk = fold_up2x_kernel_phase3x3(kernel).astype(self.dtype)
            o = jax.lax.conv_general_dilated(
                xd, kk, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=dn,
            )  # (b, h, w, 4*Cout), phases aligned at the window center
            y = o.reshape(b, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, 2 * h, 2 * w, co)
        assert self.impl == "fold2x2", self.impl
        kk = fold_up2x_kernel(kernel).astype(self.dtype)
        o = jax.lax.conv_general_dilated(
            xd, kk, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dn,
        )  # (b, h+1, w+1, 4*Cout); window at p covers x[p-1, p]
        p00 = o[:, :h, :w, :co]
        p01 = o[:, :h, 1:, co : 2 * co]
        p10 = o[:, 1:, :w, 2 * co : 3 * co]
        p11 = o[:, 1:, 1:, 3 * co :]
        y = jnp.stack([p00, p01, p10, p11], axis=3)  # (b,h,w,4,co)
        y = y.reshape(b, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, co)


def _conv3x3_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_dot_wgrad(x, k):
    """3x3 'same' conv whose WEIGHT gradient is computed as nine large
    MXU dots instead of XLA's conv-shaped wgrad (cfg.JAX.CONV_WGRAD_DOT).

    Motivation: the r4 trace showed the 128^2 ResBlock conv backwards
    running ~2.9x their forwards — the wgrad convolution (contracting over
    batch x space with a feature-map-sized 'kernel') tiles poorly.  The
    same contraction expressed as ``einsum('bhwc,bhwo->co')`` per kernel
    tap is a (C, Cout) dot with a huge (B*H*W) contraction dim — exactly
    the shape the MXU wants.  Same math, same FLOPs; only the lowering of
    dW changes.  dx keeps XLA's standard transposed-conv dgrad."""
    return _conv3x3_same(x, k)


def _conv3x3_dot_fwd(x, k):
    return _conv3x3_same(x, k), (x, k)


def _conv3x3_dot_bwd(res, dy):
    x, k = res
    # dgrad: correlation with the spatially-flipped, I/O-swapped kernel
    kt = k[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,Cout,Cin) HWIO
    dx = _conv3x3_same(dy, kt)
    # wgrad: nine shifted-view dots; tap (di,dj) sees x shifted by
    # (di-1, dj-1) under 'same' padding
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dk = jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwo->co", xp[:, di:di + h, dj:dj + w, :], dy)
            for dj in range(3)
        ], 0)
        for di in range(3)
    ], 0)  # (3,3,Cin,Cout)
    return dx.astype(x.dtype), dk.astype(k.dtype)


conv3x3_dot_wgrad.defvjp(_conv3x3_dot_fwd, _conv3x3_dot_bwd)


class _LanePaddedConv3x3(nn.Module):
    """3x3 'same' conv computed with the kernel zero-padded to ``pad_to``
    output channels, sliced back to ``features`` — exact same math and the
    same parameter tree as the plain conv (param 'kernel', (3,3,Cin,Cout),
    f32, same init stream).

    Motivation: a Cout=3 RGB head leaves the MXU lane dimension 3/128
    occupied, and the r4 trace showed each GetImageG backward running ~3x
    its forward (5.3 ms vs 1.8 ms at 256^2, 'Cout=3 lane padding') — the
    zero-pad lets XLA tile the head and its wgrad/dgrad at a packing-
    friendly channel count while the parameters (and therefore checkpoints
    and the torch importers) stay (3,3,Cin,3)."""

    features: int
    pad_to: int = 0
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", ortho_init, (3, 3, cin, self.features), jnp.float32
        )
        padded = self.pad_to > self.features
        kk = kernel
        if padded:
            kk = jnp.pad(
                kernel,
                ((0, 0), (0, 0), (0, 0), (0, self.pad_to - self.features)),
            )
        kk = kk.astype(self.dtype)
        conv = conv3x3_dot_wgrad if self.wgrad_dot else _conv3x3_same
        o = conv(x.astype(self.dtype), kk)
        return o[..., : self.features] if padded else o


class Conv3x3(nn.Module):
    """3x3 stride-1 'same' conv, no bias (reference conv3x3, model.py:32-35).

    ``up2x=True`` computes ``conv3x3(nearest_up2(x))`` via the folded
    low-resolution form (:class:`_FoldedUpConv3x3`) — same parameters,
    same math, 2.25x fewer FLOPs and no high-res intermediate.

    ``out_pad=N`` (N > features) computes the conv at N zero-padded output
    channels and slices back (:class:`_LanePaddedConv3x3`) — an exact
    identity for narrow heads (cfg.JAX.RGB_HEAD_PAD).

    ``wgrad_dot=True`` keeps the forward identical but lowers the weight
    gradient as nine shifted-view MXU dots (:func:`conv3x3_dot_wgrad`,
    cfg.JAX.CONV_WGRAD_DOT)."""

    features: int
    dtype: Dtype = jnp.float32
    up2x: bool = False
    up2x_impl: str = "phase3x3"  # cfg.JAX.UPBLOCK_FUSED_IMPL
    out_pad: int = 0  # cfg.JAX.RGB_HEAD_PAD
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT

    @nn.compact
    def __call__(self, x):
        if self.up2x:
            return _FoldedUpConv3x3(
                self.features, dtype=self.dtype, impl=self.up2x_impl,
                name="Conv_0"
            )(x)
        if self.out_pad > self.features or self.wgrad_dot:
            return _LanePaddedConv3x3(
                self.features, pad_to=self.out_pad,
                wgrad_dot=self.wgrad_dot, dtype=self.dtype,
                name="Conv_0"
            )(x)
        return nn.Conv(
            self.features,
            (3, 3),
            strides=1,
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(x)


class Conv1x1(nn.Module):
    """1x1 conv (reference conv1x1, model.py:26-29)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (1, 1),
            strides=1,
            padding=0,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with reference-matching hyperparameters (torch BatchNorm2d:
    eps=1e-5, running-stat momentum 0.1 -> flax momentum 0.9) and N(1,0.02)
    scale init.  Under jit over a batch sharded on the `data` mesh axis the
    batch statistics are global (XLA inserts the cross-replica reduction),
    giving synced batch-norm without explicit collectives.

    ``compact=True`` (cfg.JAX.BN_COMPACT) computes the same math via
    :class:`_CompactBatchNorm`: the batch statistics are folded into
    per-channel f32 scale/offset applied in the compute dtype, so the
    (B,H,W,C) activation is never promoted to f32 (flax's normalize path
    materializes ``x_f32 - mean``).  On-chip evidence: the two largest
    HLO temps of the b256 step were 4.00G f32 buffers from exactly this
    promotion in NextStageG UpBlock BatchNorms (logs/r3_ablations.log
    2026-08-19 20:50).  Same parameter/batch_stats tree, so checkpoints
    and torch importers are unaffected."""

    dtype: Dtype = jnp.float32
    compact: Any = False  # False | True | "large" (cfg.JAX.BN_COMPACT)

    @nn.compact
    def __call__(self, x, train: bool = True):
        # "large": use the compact form ONLY where the activation is big
        # (H >= 128).  The r4 full-scope A/B measured bnc +17.4 ms at the
        # lean b128 point while the trace shows the flax f32 promotion
        # costing ~10.7 ms at the single 256^2 UpBlock BN — i.e. the
        # hand-VJP wins at large-spatial sites and loses at the many
        # small ones; "large" takes only the winning side.
        use_compact = self.compact is True or (
            self.compact == "large" and x.ndim == 4 and x.shape[1] >= 128)
        if use_compact:
            # name='BatchNorm_0' keeps the variable tree identical to the
            # flax path (our wrapper auto-names its inner module).
            return _CompactBatchNorm(dtype=self.dtype, name="BatchNorm_0")(
                x, use_running_average=not train
            )
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            scale_init=bn_scale_init,
        )(x)


class _CompactBatchNorm(nn.Module):
    """Memory-compact BatchNorm: identical semantics and variable tree to
    the flax ``nn.BatchNorm`` configuration above (params scale/bias f32,
    batch_stats mean/var f32, momentum 0.9, eps 1e-5, fast variance
    E[x^2]-E[x]^2), but the data path stays in the compute dtype:

    * stats are reduced with f32 accumulation directly from the input;
    * normalize is ``x * a + b`` with per-channel ``a = scale/sqrt(var+eps)``
      and ``b = bias - mean*a`` folded in f32 then cast to the compute
      dtype — one fused elementwise pass, no f32 (B,H,W,C) intermediate;
    * the backward is the hand-written fused BN gradient
      (ops/norms.py ``bn_train_apply``): residuals are the compute-dtype
      input + per-channel stats, so no f32 activation exists in the
      backward either.

    vs flax the only difference is rounding (a, b quantized to bf16 before
    the elementwise apply instead of the result after it); parity is
    pinned in tests/test_blocks_bn_compact.py."""

    dtype: Dtype = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        feature_shape = (x.shape[-1],)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(feature_shape, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(feature_shape, jnp.float32))
        scale = self.param("scale", bn_scale_init, feature_shape, jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, feature_shape, jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            a = inv.astype(self.dtype)
            b = (bias - mean * inv).astype(self.dtype)
            return x.astype(self.dtype) * a + b

        # Hand-written VJP (ops/norms.py): residuals are the compute-dtype
        # input + per-channel stats; backward is two fused reductions + one
        # elementwise combine.  The earlier jax.checkpoint(stats) variant
        # still built the f32 activation cast in the backward and OOMed
        # at runtime on-chip at the b128-nochunk point that plain flax BN
        # fits (logs/r3_ablations.log 2026-08-19 22:50).
        y, mean, var = bn_train_apply(
            x.astype(self.dtype), scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = (m * ra_mean.value
                             + (1.0 - m) * jax.lax.stop_gradient(mean))
            ra_var.value = (m * ra_var.value
                            + (1.0 - m) * jax.lax.stop_gradient(var))
        return y


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x spatial upsample, NHWC (reference nn.Upsample
    scale_factor=2 mode='nearest', model.py:41).  repeat() lowers to cheap
    broadcasts on TPU."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class UpBlock(nn.Module):
    """nearest-up2x -> conv3x3(out*2) -> BN -> GLU (reference upBlock,
    model.py:39-45).

    ``fused=True`` (cfg.JAX.UPBLOCK_FUSED) folds the upsample into the
    conv (:class:`_FoldedUpConv3x3`, lowering per ``fused_impl`` =
    cfg.JAX.UPBLOCK_FUSED_IMPL): exact same math and parameter tree; the
    4x-size pre-conv activation never exists as a separate tensor."""

    features: int
    dtype: Dtype = jnp.float32
    fused: bool = False
    fused_impl: str = "phase3x3"
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.fused:
            x = Conv3x3(self.features * 2, dtype=self.dtype, up2x=True,
                        up2x_impl=self.fused_impl)(x)
        else:
            x = upsample_nearest_2x(x)
            x = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(x, train)
        return glu(x)


class Block3x3Relu(nn.Module):
    """conv3x3(out*2) -> BN -> GLU, keeps spatial size (reference
    Block3x3_relu, model.py:49-54)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(x, train)
        return glu(x)


class ResBlock(nn.Module):
    """conv3x3(2c)-BN-GLU-conv3x3(c)-BN + skip (reference ResBlock,
    model.py:57-71).

    ``wgrad_dot`` (cfg.JAX.CONV_WGRAD_DOT) lowers these convs' weight
    gradients as MXU dots — the r4 trace named the 128^2 ResBlock conv
    backwards at ~2.9x their forwards (conv-shaped wgrad)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"
    wgrad_dot: bool = False  # cfg.JAX.CONV_WGRAD_DOT

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv3x3(self.features * 2, dtype=self.dtype,
                    wgrad_dot=self.wgrad_dot)(x)
        h = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(h, train)
        h = glu(h)
        h = Conv3x3(self.features, dtype=self.dtype,
                    wgrad_dot=self.wgrad_dot)(h)
        h = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(h, train)
        return x + h


class CANet(nn.Module):
    """Conditioning augmentation: linear(t_dim -> 4*c_dim) -> GLU ->
    (mu, logvar) -> reparameterized sample (reference CA_NET,
    model.py:271-299)."""

    c_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sent_emb, rng):
        x = nn.Dense(self.c_dim * 4, dtype=self.dtype, kernel_init=ortho_init)(
            sent_emb
        )
        x = glu(x)
        mu, logvar = x[:, : self.c_dim], x[:, self.c_dim :]
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        eps = jax.random.normal(rng, std.shape, jnp.float32)
        c_code = (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)
        return c_code, mu, logvar


class MappingNet(nn.Module):
    """z -> w: stack of bias-free linears (reference MAPPING_NET — 6 layers in
    model.py:301-321, 8 layers in model_bert.py:334-348; depth is the
    `num_layers` field here, wired to cfg.GAN.M_NUM)."""

    w_dim: int
    num_layers: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        w = z
        for _ in range(self.num_layers):
            w = nn.Dense(
                self.w_dim, use_bias=False, dtype=self.dtype, kernel_init=ortho_init
            )(w)
        return w


def instance_norm_2d(x: jax.Array, eps: float = 1e-5,
                     compact: Any = False) -> jax.Array:
    """Per-sample, per-channel normalization over H,W — torch
    InstanceNorm2d(affine=False) semantics, NHWC layout.

    ``compact=True`` (cfg.JAX.BN_COMPACT) is the same memory discipline as
    :class:`_CompactBatchNorm`: stats folded into per-(sample,channel) f32
    scale/offset applied in the compute dtype with a hand-written VJP
    (ops/norms.py) — the (B,H,W,C) activation is never promoted to f32 in
    either pass."""
    use_compact = compact is True or (
        compact == "large" and x.ndim == 4 and x.shape[1] >= 128)
    if not use_compact:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return instance_norm_train_apply(x, eps)


class AdaINNorm(nn.Module):
    """AdaIN style injection: out = (gamma+1) * IN(h) + beta with
    (gamma, beta) = linear(w) (reference ADAIN_NORM, model.py:324-339)."""

    features: int
    dtype: Dtype = jnp.float32
    compact: Any = False  # cfg.JAX.BN_COMPACT (see instance_norm_2d)

    @nn.compact
    def __call__(self, h, w_code):
        style = nn.Dense(
            self.features * 2, dtype=self.dtype, kernel_init=ortho_init
        )(w_code)
        gamma, beta = jnp.split(style, 2, axis=-1)
        gamma = gamma[:, None, None, :]
        beta = beta[:, None, None, :]
        out = instance_norm_2d(h, compact=self.compact)
        return (gamma + 1.0) * out + beta


# --------------------------- discriminator blocks --------------------------


class Block3x3LeakRelu(nn.Module):
    """conv3x3 -> BN -> LeakyReLU(0.2), keeps spatial size (reference
    Block3x3_leakRelu, model.py:540-546)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(x, train)
        return nn.leaky_relu(x, 0.2)


class DownBlock(nn.Module):
    """4x4 stride-2 conv -> BN -> LeakyReLU(0.2): spatial /2 (reference
    downBlock, model.py:550-556)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features,
            (4, 4),
            strides=2,
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(x)
        x = BatchNorm(dtype=self.dtype, compact=self.bn_compact)(x, train)
        return nn.leaky_relu(x, 0.2)


class EncodeBy16(nn.Module):
    """Four stride-2 4x4 convs: 3 -> ndf -> 2ndf -> 4ndf -> 8ndf, spatial /16
    (reference encode_image_by_16times, model.py:560-578).  First conv has no
    BatchNorm."""

    ndf: int
    dtype: Dtype = jnp.float32
    bn_compact: Any = False  # False | True | "large"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.ndf,
            (4, 4),
            strides=2,
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=ortho_init,
        )(x)
        x = nn.leaky_relu(x, 0.2)
        for mult in (2, 4, 8):
            x = DownBlock(self.ndf * mult, dtype=self.dtype,
                          bn_compact=self.bn_compact)(x, train)
        return x
