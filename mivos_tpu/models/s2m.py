"""Scribble-to-mask network: DeepLabV3+ / ResNet-50, 6-channel input
(RGB + previous mask + positive scribbles + negative scribbles).

Reference: model/s2m/{s2m_network,s2m_resnet,_deeplab,utils}.py —
deeplabv3plus_resnet50(num_classes=1, output_stride=16), 6-ch conv1
(s2m_resnet.py:92). Flax/NHWC; all BN frozen (inference-only module).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.models.layers import FrozenBatchNorm, conv1x1, conv3x3
from mivos_tpu.models.resnet import ResNet50
from mivos_tpu.ops.resize import bilinear_resize


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        if self.kernel == 1:
            x = conv1x1(self.features, use_bias=False, name="conv",
                        dtype=self.dtype)(x)
        else:
            x = conv3x3(self.features, dilation=self.dilation,
                        use_bias=False, name="conv", dtype=self.dtype)(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference _deeplab.py:135-164):
    1x1 conv + three dilated 3x3 convs + global-pool branch, projected
    1280 -> 256. Dropout is inference-disabled (the whole module runs
    frozen, matching the reference's eval-mode usage)."""

    rates: Tuple[int, int, int] = (6, 12, 18)
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        branches = [ConvBNReLU(256, kernel=1, dtype=self.dtype,
                               name="b0")(x)]
        for i, r in enumerate(self.rates):
            branches.append(ConvBNReLU(256, kernel=3, dilation=r,
                                       dtype=self.dtype,
                                       name=f"b{i + 1}")(x))
        gp = jnp.mean(x, axis=(-3, -2), keepdims=True)
        gp = ConvBNReLU(256, kernel=1, dtype=self.dtype,
                        name="pool_conv")(gp)
        gp = jnp.broadcast_to(gp, gp.shape[:-3] + (h, w, gp.shape[-1]))
        branches.append(gp)
        x = jnp.concatenate(branches, axis=-1)
        return ConvBNReLU(256, kernel=1, dtype=self.dtype,
                          name="project")(x)


class DeepLabHeadV3Plus(nn.Module):
    """Low-level projection + ASPP + classifier
    (reference _deeplab.py:30-53)."""

    num_classes: int = 1
    aspp_rates: Tuple[int, int, int] = (6, 12, 18)
    dtype: str = None

    @nn.compact
    def __call__(self, out_feat, low_level_feat):
        low = ConvBNReLU(48, kernel=1, dtype=self.dtype,
                         name="project")(low_level_feat)
        x = ASPP(self.aspp_rates, dtype=self.dtype, name="aspp")(out_feat)
        x = bilinear_resize(x, (low.shape[-3], low.shape[-2]))
        x = jnp.concatenate([low, x], axis=-1)
        x = ConvBNReLU(256, kernel=3, dtype=self.dtype,
                       name="classifier0")(x)
        return conv1x1(self.num_classes, dtype=self.dtype,
                       name="classifier1")(x)


class S2MNetwork(nn.Module):
    """deeplabv3plus_resnet50(num_classes=1, output_stride=16) with a
    6-channel stem (reference s2m_network.py:56-64)."""

    num_classes: int = 1
    in_chans: int = 6
    # Compute dtype ('bfloat16' for production inference); params fp32.
    dtype: str = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 6) -> (B, H, W, num_classes) logits at input size
        (reference utils.py:15-20 upsamples bilinearly)."""
        h, w = x.shape[-3], x.shape[-2]
        out, _, _, low = ResNet50(in_chans=self.in_chans, num_stages=4,
                                  layer4_dilation=2, conv_bias=False,
                                  dtype=self.dtype, name="backbone")(x)
        logits = DeepLabHeadV3Plus(self.num_classes, dtype=self.dtype,
                                   name="classifier")(out, low)
        return bilinear_resize(logits.astype(jnp.float32), (h, w))
