"""Shared NN building blocks (flax.linen, NHWC).

Every BatchNorm in this framework runs with frozen statistics: the
reference keeps BN in eval mode even while training the fusion module
(reference: model/fusion_model.py:199-200), and all inference paths use
pretrained frozen stats. FrozenBatchNorm therefore stores (scale, bias,
mean, var) as plain parameters and applies a pure affine transform that
XLA fuses into the preceding conv. Cross-device *training* BN lives in
ops/syncbn.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.ops.resize import upsample2x


def compute_dtype(name: Optional[str]):
    """Compute-dtype policy: params stay fp32; convs/activations run in
    `name` ('bfloat16' keeps the MXU at full rate — the analog of the
    reference GUI's AMP autocast, interactive_gui.py:990). None/'float32'
    = full precision (the parity-test default)."""
    if name in (None, "float32"):
        return None
    return jnp.dtype(name)


class SyncBatchNorm(nn.Module):
    """Trainable BatchNorm with cross-device stat sync — the nn-module
    consumer of ops/syncbn.py (which replaces the reference's ~420-line
    C++/CUDA SyncBN extension, fbrs/model/syncbn/). MiVOS itself never
    trains BN (fusion training keeps BN in eval, fusion_model.py:199-200)
    so no shipped model uses this; it completes the training surface for
    users fine-tuning the fbrs click models, whose upstream training
    used SyncBN.

    train=True: normalize with batch stats pmean'd over `axis_name` (when
    inside shard_map/pmap) and update the running averages in the
    'batch_stats' collection. train=False: use the running averages.
    """

    features: int
    axis_name: Optional[str] = None
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from mivos_tpu.ops.syncbn import sync_batch_norm

        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            y, (mean, var) = sync_batch_norm(x, scale, bias,
                                             self.axis_name, self.eps)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
            return y
        inv = (scale * jax.lax.rsqrt(ra_var.value + self.eps)).astype(x.dtype)
        add = (bias - ra_mean.value * scale
               * jax.lax.rsqrt(ra_var.value + self.eps)).astype(x.dtype)
        return x * inv + add


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics; a per-channel affine transform."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # No-op unless applied with mutable=["bn_stats"]: lets
        # models/initializer.calibrate_frozen_bn measure this BN's input
        # distribution for from-scratch training (converted checkpoints
        # carry trained stats; a fresh init carries (0, 1) placeholders,
        # which leaves deep residual towers unnormalized and untrainable).
        # Guarded out of init(): every collection is mutable during
        # init, so an unguarded sow would leak activation tensors into
        # model.init() results (and from there into optimizer state and
        # saved npz artifacts).
        if not self.is_initializing():
            self.sow("bn_stats", "input", x)
        # Fold into a single multiply-add; all fp32 regardless of x dtype
        # to preserve pretrained-stat precision, then cast back.
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * mul + add


def conv3x3(features: int, stride: int = 1, dilation: int = 1,
            use_bias: bool = True, name: Optional[str] = None,
            dtype: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((dilation, dilation), (dilation, dilation)),
                   kernel_dilation=(dilation, dilation),
                   use_bias=use_bias, name=name, dtype=compute_dtype(dtype))


def conv1x1(features: int, stride: int = 1, use_bias: bool = True,
            name: Optional[str] = None,
            dtype: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding="VALID",
                   use_bias=use_bias, name=name, dtype=compute_dtype(dtype))


class ResBlock(nn.Module):
    """Pre-activation residual block of the propagation decoder
    (reference: model/propagation/modules.py:15-35)."""

    out_dim: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        r = conv3x3(self.out_dim, name="conv1", dtype=self.dtype)(nn.relu(x))
        r = conv3x3(self.out_dim, name="conv2", dtype=self.dtype)(nn.relu(r))
        if in_dim != self.out_dim:
            x = conv3x3(self.out_dim, name="downsample", dtype=self.dtype)(x)
        return x + r


class UpsampleBlock(nn.Module):
    """Skip-connected 2x upsampling block
    (reference: model/propagation/modules.py:92-104).

    The skip tower (`skip`: conv3x3 + ResBlock over the encoder skip
    features) is object-independent, so sessions may precompute it once
    per frame in the batched query pre-encode and call with
    preskip=True — identical math, better MXU utilization than running
    it batch-1 inside the propagation scan (see Decoder.skips)."""

    up_dim: int
    out_dim: int
    dtype: Optional[str] = None

    def setup(self):
        self.skip_conv1 = conv3x3(self.up_dim, dtype=self.dtype)
        self.skip_conv2 = ResBlock(self.up_dim, dtype=self.dtype)
        self.out_conv = ResBlock(self.out_dim, dtype=self.dtype)

    def skip(self, skip_f: jax.Array) -> jax.Array:
        return self.skip_conv2(self.skip_conv1(skip_f))

    def __call__(self, skip_f: jax.Array, up_f: jax.Array,
                 preskip: bool = False) -> jax.Array:
        """skip_f: encoder skip features — or, with preskip=True, the
        already-computed `skip(skip_f)` tower output."""
        x = skip_f if preskip else self.skip(skip_f)
        x = x + upsample2x(up_f).astype(x.dtype)
        return self.out_conv(x)


class KeyValue(nn.Module):
    """3x3 key/value projection heads
    (reference: model/propagation/modules.py:107-114)."""

    key_dim: int = 128
    val_dim: int = 512
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        k = conv3x3(self.key_dim, name="key_proj", dtype=self.dtype)(x)
        v = conv3x3(self.val_dim, name="val_proj", dtype=self.dtype)(x)
        return k, v


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
