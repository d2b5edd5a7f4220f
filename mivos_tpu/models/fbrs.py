"""f-BRS interactive segmentation model: DistMaps + DeepLabV3+ (gluon
ResNet-50-v1s, output-stride 8) + separable-conv head.

Reference: fbrs/model/is_deeplab_model.py, fbrs/model/modeling/
{deeplab_v3,resnetv1b,basic_blocks}.py. Architectural facts preserved
for checkpoint parity:
  * deep stem (3x 3x3 convs, stem_width 64 -> 128), bias-free convs
  * dilated backbone: layer3 stride 1 dil 2 (first block dil 1),
    layer4 stride 1 dil 4 (first block dil 2)  [resnetv1b.py:137-196]
  * rgb_conv: 1x1 5->8, LeakyReLU(0.2), BN, 1x1 8->3
  * ASPP rates 12/24/36 @ os8, project to 256 (+dropout, eval-disabled)
  * skip_project c1 256->32; head input cat(aspp_up, skip) = 288 ch
  * ALL interpolations align_corners=True
All BN frozen (inference-only subsystem).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.models.layers import FrozenBatchNorm, conv1x1, conv3x3, max_pool_3x3_s2
from mivos_tpu.ops.distmaps import dist_maps
from mivos_tpu.ops.resize import bilinear_resize_align_corners as up_ac


class V1bBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = conv1x1(self.planes, use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = conv3x3(self.planes, stride=self.stride, dilation=self.dilation,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = conv1x1(self.planes * 4, use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            res = conv1x1(self.planes * 4, stride=self.stride, use_bias=False,
                          name="downsample_conv")(x)
            res = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class V1bBasicBlock(nn.Module):
    """BasicBlockV1b (resnetv1b.py:6-39): conv1 carries the per-block
    dilation, conv2 always runs at the stage's `previous_dilation`."""

    planes: int
    stride: int = 1
    dil1: int = 1
    dil2: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.planes, stride=self.stride, dilation=self.dil1,
                      use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = conv3x3(self.planes, dilation=self.dil2, use_bias=False,
                      name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.has_downsample:
            res = conv1x1(self.planes, stride=self.stride, use_bias=False,
                          name="downsample_conv")(x)
            res = FrozenBatchNorm(self.planes, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class V1bStage(nn.Module):
    """resnetv1b _make_layer (resnetv1b.py:154-197): with dilation d>1 the
    stage keeps stride (=1 at call sites), first block runs at d//2
    (dilation 4 -> first block 2; dilation 2 -> first block 1)."""

    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    block: str = "bottleneck"   # 'bottleneck' (50/101/152) | 'basic' (34)

    @nn.compact
    def __call__(self, x):
        first_dil = {1: 1, 2: 1, 4: 2}[self.dilation]
        if self.block == "bottleneck":
            needs_ds = self.stride != 1 or x.shape[-1] != self.planes * 4
            x = V1bBottleneck(self.planes, stride=self.stride,
                              dilation=first_dil, has_downsample=needs_ds,
                              name="block0")(x)
            for i in range(1, self.blocks):
                x = V1bBottleneck(self.planes, dilation=self.dilation,
                                  name=f"block{i}")(x)
        else:
            needs_ds = self.stride != 1 or x.shape[-1] != self.planes
            x = V1bBasicBlock(self.planes, stride=self.stride,
                              dil1=first_dil, dil2=self.dilation,
                              has_downsample=needs_ds, name="block0")(x)
            for i in range(1, self.blocks):
                x = V1bBasicBlock(self.planes, dil1=self.dilation,
                                  dil2=self.dilation, name=f"block{i}")(x)
        return x


# Reference backbone family (resnetv1b.py:227-266): arch -> stage plan.
RESNETV1B_ARCHS = {
    "resnet34": dict(layers=(3, 4, 6, 3), block="basic", deep_stem=False),
    "resnet50": dict(layers=(3, 4, 6, 3), block="bottleneck", deep_stem=True),
    "resnet101": dict(layers=(3, 4, 23, 3), block="bottleneck",
                      deep_stem=True),
    "resnet152": dict(layers=(3, 8, 36, 3), block="bottleneck",
                      deep_stem=True),
}


class ResNetV1b(nn.Module):
    """Dilated ResNetV1b backbone family -> (c1, c2, c3, c4) at strides
    4/8/8/8 (resnetv1b.py:85-214 with dilated=True): deep-stem
    bottleneck v1s variants (resnet50/101/152_v1s, :240-266) and the
    plain-stem basic-block resnet34_v1b (:227-237)."""

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    deep_stem: bool = True
    stem_width: int = 64

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        sw = self.stem_width
        if self.deep_stem:
            x = conv3x3(sw, stride=2, use_bias=False, name="stem0")(x)
            x = nn.relu(FrozenBatchNorm(sw, name="stem_bn0")(x))
            x = conv3x3(sw, use_bias=False, name="stem1")(x)
            x = nn.relu(FrozenBatchNorm(sw, name="stem_bn1")(x))
            x = conv3x3(2 * sw, use_bias=False, name="stem2")(x)
            x = nn.relu(FrozenBatchNorm(2 * sw, name="bn1")(x))
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                        use_bias=False, name="conv1")(x)
            x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = max_pool_3x3_s2(x)
        blk = self.block
        c1 = V1bStage(64, self.layers[0], block=blk, name="layer1")(x)
        c2 = V1bStage(128, self.layers[1], stride=2, block=blk,
                      name="layer2")(c1)
        c3 = V1bStage(256, self.layers[2], stride=1, dilation=2, block=blk,
                      name="layer3")(c2)
        c4 = V1bStage(512, self.layers[3], stride=1, dilation=4, block=blk,
                      name="layer4")(c3)
        return c1, c2, c3, c4


class ResNet50V1s(ResNetV1b):
    """Back-compat alias: the resnet50_v1s default configuration."""


class SeparableConvBNReLU(nn.Module):
    """depthwise 3x3 + pointwise 1x1 + BN + ReLU (basic_blocks.py:57-71)."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=in_ch, use_bias=False, name="dw")(x)
        x = conv1x1(self.features, use_bias=False, name="pw")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x)


class FBRSASPP(nn.Module):
    """_ASPP (deeplab_v3.py:115-147): rates 12/24/36, align-corners
    pooling upsample, dropout disabled at inference."""

    out_ch: int = 256
    rates: Tuple[int, int, int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]

        def cbr(y, kernel, dil, name):
            if kernel == 1:
                y = conv1x1(self.out_ch, use_bias=False, name=f"{name}_conv")(y)
            else:
                y = conv3x3(self.out_ch, dilation=dil, use_bias=False,
                            name=f"{name}_conv")(y)
            return nn.relu(FrozenBatchNorm(self.out_ch, name=f"{name}_bn")(y))

        bs = [cbr(x, 1, 1, "b0")]
        for i, r in enumerate(self.rates):
            bs.append(cbr(x, 3, r, f"b{i + 1}"))
        gp = jnp.mean(x, axis=(-3, -2), keepdims=True)
        gp = cbr(gp, 1, 1, "pool")
        bs.append(jnp.broadcast_to(gp, gp.shape[:-3] + (h, w, self.out_ch)))
        y = jnp.concatenate(bs, axis=-1)
        return cbr(y, 1, 1, "project")


class FBRSDeepLabModel(nn.Module):
    """DistMapsModel (is_deeplab_model.py:30-66) exposed as three jit
    targets: full forward, cached head-input, and the small differentiable
    head replay that f-BRS-B optimizes through.

    `arch` selects the ResNetV1b backbone depth (reference get_deeplab_model
    backbone kwarg, is_deeplab_model.py:9-13); `ch` is deeplab_ch (the 34
    checkpoints ship ch=128, 50/101 ship 256 — utils.py:85-88)."""

    arch: str = "resnet50"
    ch: int = 256
    norm_radius: float = 260.0

    def setup(self):
        self.rgb_conv_0 = conv1x1(8, name="rgb_conv_0")
        self.rgb_conv_bn = FrozenBatchNorm(8, name="rgb_conv_bn")
        self.rgb_conv_1 = conv1x1(3, name="rgb_conv_1")
        self.backbone = ResNetV1b(**RESNETV1B_ARCHS[self.arch])
        self.skip_project_conv = conv1x1(32, use_bias=False,
                                         name="skip_project_conv")
        self.skip_project_bn = FrozenBatchNorm(32, name="skip_project_bn")
        self.aspp = FBRSASPP(self.ch, name="aspp")
        self.head_sep0 = SeparableConvBNReLU(self.ch, name="head_sep0")
        self.head_sep1 = SeparableConvBNReLU(self.ch, name="head_sep1")
        self.head_out = conv1x1(self.ch, name="head_out")
        self.sep_head0 = SeparableConvBNReLU(self.ch // 2, name="sep_head0")
        self.sep_head1 = SeparableConvBNReLU(self.ch // 2, name="sep_head1")
        self.sep_head_out = conv1x1(1, name="sep_head_out")

    def _rgb_conv(self, image, coord_feat):
        x = jnp.concatenate([image, coord_feat], axis=-1)
        x = self.rgb_conv_0(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = self.rgb_conv_bn(x)
        return self.rgb_conv_1(x)

    def _features_from(self, x):
        c1, _, _, c4 = self.backbone(x)
        c1 = nn.relu(self.skip_project_bn(self.skip_project_conv(c1)))
        a = self.aspp(c4)
        a = up_ac(a, (c1.shape[-3], c1.shape[-2]))
        return jnp.concatenate([a, c1], axis=-1)

    def head_input(self, image, points):
        """-> (B, H/4, W/4, ch+32) after-ASPP features: the cached tensor
        that f-BRS-B scales/biases (brs.py:121-140, insertion_mode
        'after_aspp')."""
        coord = dist_maps(points, image.shape[-3], image.shape[-2],
                          self.norm_radius)
        return self._features_from(self._rgb_conv(image, coord))

    def head_input_c4(self, image, points):
        """f-BRS-A insertion (brs.py:121-140, 'after_c4'): cache the raw
        backbone c4 (the scale/bias target, 2048 ch) plus the projected
        c1 skip features (constant through the optimization)."""
        coord = dist_maps(points, image.shape[-3], image.shape[-2],
                          self.norm_radius)
        c1, _, _, c4 = self.backbone(self._rgb_conv(image, coord))
        c1 = nn.relu(self.skip_project_bn(self.skip_project_conv(c1)))
        return c4, c1

    def head_input_deeplab(self, image, points):
        """f-BRS-C insertion (brs.py:54-67, 'after_deeplab'): cache the
        full DeepLab feature-extractor output (ch=256, post _DeepLabHead,
        reference deeplab_v3.py:72-81); only SepConvHead replays."""
        feats = self.head_input(image, points)
        return self._deeplab_head(feats)

    def _deeplab_head(self, x):
        """_DeepLabHead (deeplab_v3.py:100-113): 2 sep convs + 1x1."""
        x = self.head_sep0(x)
        x = self.head_sep1(x)
        return self.head_out(x)

    def _sep_conv_head(self, x, out_hw: Tuple[int, int]):
        """SepConvHead (basic_blocks.py:27-52) + align-corners upsample."""
        x = self.sep_head0(x)
        x = self.sep_head1(x)
        x = self.sep_head_out(x)
        return up_ac(x, out_hw)

    def head_replay_c4(self, c4, c1, out_hw: Tuple[int, int]):
        """f-BRS-A replay (brs.py:91-103): ASPP over the scaled c4,
        upsample, concat the cached c1 skip, then both heads."""
        a = self.aspp(c4)
        a = up_ac(a, (c1.shape[-3], c1.shape[-2]))
        feats = jnp.concatenate([a, c1], axis=-1)
        return self._sep_conv_head(self._deeplab_head(feats), out_hw)

    def head_replay_deeplab(self, feats, out_hw: Tuple[int, int]):
        """f-BRS-C replay: only SepConvHead runs per L-BFGS evaluation."""
        return self._sep_conv_head(feats, out_hw)

    def forward_with_input_bias(self, image, points, rgb_bias, coord_bias):
        """Input-space BRS forward (reference InputBRSPredictor,
        brs.py:228-280): additive optimization variables on the RGB
        input ('RGB-BRS') or on the click distance maps
        ('DistMap-BRS'). Returns full-resolution logits."""
        h, w = image.shape[-3], image.shape[-2]
        coord = dist_maps(points, h, w, self.norm_radius) + coord_bias
        x = self._rgb_conv(image + rgb_bias, coord)
        feats = self._features_from(x)
        return self.head_replay(feats, (h, w))

    def head_replay(self, feats, out_hw: Tuple[int, int]):
        """The differentiable tail for f-BRS-B: _DeepLabHead (2 sep convs
        + 1x1) then SepConvHead then align-corners upsample to out_hw
        (brs.py:82-103)."""
        return self._sep_conv_head(self._deeplab_head(feats), out_hw)

    def __call__(self, image, points):
        """Full forward -> (B, H, W, 1) logits (is_deeplab_model.py:50-66)."""
        feats = self.head_input(image, points)
        return self.head_replay(feats, (image.shape[-3], image.shape[-2]))


def init_params(model: FBRSDeepLabModel, key, image, points,
                init_flavor: str = "default"):
    """Construct params for a from-scratch fbrs model; see
    models/initializer.py::init_model_params for the flavors."""
    from mivos_tpu.models.initializer import init_model_params

    return init_model_params(model, key, image, points,
                             init_flavor=init_flavor)
