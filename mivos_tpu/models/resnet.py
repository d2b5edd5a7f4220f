"""ResNet-50 feature backbone (flax.linen, NHWC, frozen BN).

One configurable implementation covers the reference's three ResNet
flavors:
  * RGBEncoder backbone — torchvision resnet50, bias-free convs
    (reference: model/propagation/modules.py:67-89)
  * MaskRGBEncoder backbone — mod_resnet with 3+extra input channels and
    biased convs (reference: model/propagation/mod_resnet.py:115-157)
  * S2M / f-BRS DeepLab backbones — torchvision-style with
    replace_stride_with_dilation (reference: model/s2m/s2m_resnet.py)

Stride lives on the 3x3 conv of each bottleneck (ResNet v1.5, matching
both torchvision and mod_resnet). Output is the feature pyramid
(f4, f8, f16[, f32]) at strides 4/8/16(/16-or-32).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from mivos_tpu.models.layers import (FrozenBatchNorm, compute_dtype,
                                     conv1x1, conv3x3, max_pool_3x3_s2)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    conv_bias: bool = False
    expansion: int = 4
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = conv1x1(self.planes, use_bias=self.conv_bias, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, stride=self.stride, dilation=self.dilation,
                      use_bias=self.conv_bias, name="conv2",
                      dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = conv1x1(self.planes * self.expansion, use_bias=self.conv_bias,
                      name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes * self.expansion, name="bn3")(out)
        if self.has_downsample:
            res = conv1x1(self.planes * self.expansion, stride=self.stride,
                          use_bias=self.conv_bias, name="downsample_conv",
                          dtype=self.dtype)(x)
            res = FrozenBatchNorm(self.planes * self.expansion,
                                  name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNetStage(nn.Module):
    """One ResNet layer group.

    `dilate=True` implements torchvision's replace_stride_with_dilation:
    the stage keeps stride 1, the FIRST block runs at the previous
    dilation (prev_dilation), and the remaining blocks at
    prev_dilation * stride.
    """

    planes: int
    blocks: int
    stride: int = 1
    dilate: bool = False
    prev_dilation: int = 1
    conv_bias: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.dilate:
            first_stride = 1
            first_dilation = self.prev_dilation
            rest_dilation = self.prev_dilation * self.stride
        else:
            first_stride = self.stride
            first_dilation = rest_dilation = self.prev_dilation
        needs_ds = first_stride != 1 or x.shape[-1] != self.planes * 4
        x = Bottleneck(self.planes, stride=first_stride, dilation=first_dilation,
                       has_downsample=needs_ds, conv_bias=self.conv_bias,
                       dtype=self.dtype, name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dilation=rest_dilation,
                           conv_bias=self.conv_bias, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class ResNet50(nn.Module):
    """Feature-pyramid ResNet-50.

    in_chans: input channels (3 for RGB, 5 for mask-RGB, 6 for S2M).
    num_stages: 3 returns (f4, f8, f16); 4 also runs layer4.
    layer4_dilation: 2 => replace layer4 stride with dilation (deeplab
      output_stride=16); 1 => normal stride-2 layer4.
    conv_bias: True for the mod_resnet flavor (propagation mask encoder).
    """

    in_chans: int = 3
    num_stages: int = 3
    layer4_dilation: int = 1
    conv_bias: bool = False
    stem_bias: Optional[bool] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        stem_bias = self.conv_bias if self.stem_bias is None else self.stem_bias
        if compute_dtype(self.dtype) is not None:
            x = x.astype(compute_dtype(self.dtype))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=stem_bias, name="conv1",
                    dtype=compute_dtype(self.dtype))(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        f4 = ResNetStage(64, 3, stride=1, conv_bias=self.conv_bias,
                         dtype=self.dtype, name="layer1")(x)
        f8 = ResNetStage(128, 4, stride=2, conv_bias=self.conv_bias,
                         dtype=self.dtype, name="layer2")(f4)
        f16 = ResNetStage(256, 6, stride=2, conv_bias=self.conv_bias,
                          dtype=self.dtype, name="layer3")(f8)
        if self.num_stages == 3:
            return f16, f8, f4
        f32 = ResNetStage(512, 3, stride=2, dilate=self.layer4_dilation > 1,
                          conv_bias=self.conv_bias, dtype=self.dtype,
                          name="layer4")(f16)
        return f32, f16, f8, f4
