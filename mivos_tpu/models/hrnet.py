"""HRNet-W18/32/48 + OCR interactive-segmentation backbone.

Reference: fbrs/model/modeling/hrnet_ocr.py (HighResolutionNet,
multi-resolution branches with full cross-resolution fusion) and
fbrs/model/modeling/ocr.py (SpatialGather + object-context attention),
wrapped by DistMapsHRNetModel (fbrs/model/is_hrnet_model.py:24-87).

flax.linen, NHWC, FrozenBatchNorm (inference subsystem). Architectural
facts preserved for checkpoint parity:
  * stem: two stride-2 3x3 convs (3->64->64), then 4x Bottleneck(64)
  * stage s has s branches at strides 4..32 with widths w*2^i
  * fuse: j>i 1x1 conv+bn then bilinear align_corners=True upsample;
    j<i chains of stride-2 3x3 conv+bn (+relu except the last)
  * head: concat all branches at stride 4 (15*w channels), OCR with
    key=ocr_width, mid=2*ocr_width, binary cls/aux heads
  * rgb_conv: 1x1 5->8, LeakyReLU(0.2), BN, 1x1 8->3
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.models.layers import FrozenBatchNorm, conv1x1, conv3x3
from mivos_tpu.ops.distmaps import dist_maps
from mivos_tpu.ops.resize import bilinear_resize_align_corners as up_ac


class BasicBlockV1b(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.planes, stride=self.stride, use_bias=False,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = conv3x3(self.planes, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.has_downsample:
            res = conv1x1(self.planes, stride=self.stride, use_bias=False,
                          name="downsample_conv")(x)
            res = FrozenBatchNorm(self.planes, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class BottleneckV1b(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = conv1x1(self.planes, use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = conv3x3(self.planes, stride=self.stride, use_bias=False,
                      name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = conv1x1(self.planes * 4, use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            res = conv1x1(self.planes * 4, stride=self.stride,
                          use_bias=False, name="downsample_conv")(x)
            res = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlocks then the full
    cross-resolution fuse (hrnet_ocr.py:13-153)."""

    channels: Tuple[int, ...]     # per-branch widths
    num_blocks: int

    @nn.compact
    def __call__(self, xs: List[jax.Array]) -> List[jax.Array]:
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                ds = x.shape[-1] != self.channels[i]
                x = BasicBlockV1b(self.channels[i], has_downsample=ds,
                                  name=f"branch{i}_block{b}")(x)
            ys.append(x)
        if n == 1:
            return ys

        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    y = ys[j]
                elif j > i:
                    y = conv1x1(self.channels[i], use_bias=False,
                                name=f"fuse{i}_{j}_conv")(ys[j])
                    y = FrozenBatchNorm(self.channels[i],
                                        name=f"fuse{i}_{j}_bn")(y)
                    y = up_ac(y, ys[i].shape[-3:-1])
                else:
                    y = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = conv3x3(ch, stride=2, use_bias=False,
                                    name=f"fuse{i}_{j}_conv{k}")(y)
                        y = FrozenBatchNorm(
                            ch, name=f"fuse{i}_{j}_bn{k}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HighResolutionNet(nn.Module):
    """width: 18/32/48; small=True halves block counts
    (hrnet_ocr.py:155-316). Binary heads (num_classes=1)."""

    width: int = 18
    num_classes: int = 1
    ocr_width: int = 256
    small: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mode: str = "full"):
        """mode: 'full' -> (cls, aux) logits at stride 4;
        'features' -> the concatenated stride-4 feature map (HRNet
        insertion mode 'A', reference brs.py:146-160);
        'head' -> x IS the feature map, run only the OCR/aux heads;
        'ocr_features' -> x IS the feature map, run aux + OCR pipeline
        and return the 2*ocr_width context features (HRNet insertion
        mode 'C', reference brs.py:215-225);
        'cls' -> x IS the OCR context features, run only cls_head."""
        if mode == "head":
            return self._head(x)
        if mode == "ocr_features":
            return self._ocr(x)[0]
        if mode == "cls":
            return conv1x1(self.num_classes, name="cls_head")(x)
        feats = self._features(x)
        if mode == "features":
            return feats
        return self._head(feats)

    def _features(self, x: jax.Array) -> jax.Array:
        w = self.width
        nb = 2 if self.small else 4

        x = conv3x3(64, stride=2, use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = conv3x3(64, stride=2, use_bias=False, name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn2")(x))
        for b in range(nb):
            x = BottleneckV1b(64, has_downsample=(b == 0),
                              name=f"layer1_block{b}")(x)

        # Transition 1: 256 -> [w, 2w] (new branch via stride-2 conv).
        widths2 = (w, 2 * w)
        b0 = nn.relu(FrozenBatchNorm(w, name="transition1_0_bn")(
            conv3x3(w, use_bias=False, name="transition1_0_conv")(x)))
        b1 = nn.relu(FrozenBatchNorm(2 * w, name="transition1_1_bn")(
            conv3x3(2 * w, stride=2, use_bias=False,
                    name="transition1_1_conv")(x)))
        xs = [b0, b1]
        xs = HRModule(widths2, nb, name="stage2_m0")(xs)

        # Transition 2: add 4w branch from the last branch.
        widths3 = (w, 2 * w, 4 * w)
        b2 = nn.relu(FrozenBatchNorm(4 * w, name="transition2_2_bn")(
            conv3x3(4 * w, stride=2, use_bias=False,
                    name="transition2_2_conv")(xs[-1])))
        xs = [xs[0], xs[1], b2]
        for m in range(3 if self.small else 4):
            xs = HRModule(widths3, nb, name=f"stage3_m{m}")(xs)

        # Transition 3: add 8w branch.
        widths4 = (w, 2 * w, 4 * w, 8 * w)
        b3 = nn.relu(FrozenBatchNorm(8 * w, name="transition3_3_bn")(
            conv3x3(8 * w, stride=2, use_bias=False,
                    name="transition3_3_conv")(xs[-1])))
        xs = [xs[0], xs[1], xs[2], b3]
        for m in range(2 if self.small else 3):
            xs = HRModule(widths4, nb, name=f"stage4_m{m}")(xs)

        # Concat everything at stride 4 (hrnet_ocr.py:368-378).
        size = xs[0].shape[-3:-1]
        return jnp.concatenate(
            [xs[0]] + [up_ac(t, size) for t in xs[1:]], axis=-1)

    def _ocr(self, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Aux head + OCR object-context pipeline -> (ocr_feats, aux)."""
        last = 15 * self.width
        aux = conv1x1(last, name="aux_head_conv1")(feats)
        aux = nn.relu(FrozenBatchNorm(last, name="aux_head_bn")(aux))
        out_aux = conv1x1(self.num_classes, name="aux_head_conv2")(aux)

        mid = 2 * self.ocr_width
        f = conv3x3(mid, name="conv3x3_ocr_conv")(feats)
        f = nn.relu(FrozenBatchNorm(mid, name="conv3x3_ocr_bn")(f))
        context = spatial_gather(f, out_aux)
        f = SpatialOCR(mid, self.ocr_width, name="ocr_distri_head")(
            f, context)
        return f, out_aux

    def _head(self, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        f, out_aux = self._ocr(feats)
        out = conv1x1(self.num_classes, name="cls_head")(f)
        return out, out_aux


def spatial_gather(feats: jax.Array, probs: jax.Array,
                   scale: float = 1.0) -> jax.Array:
    """Class-context vectors: softmax(probs) weighted feature average
    (reference ocr.py:7-27). feats (B,H,W,C), probs (B,H,W,K) ->
    (B,K,C)."""
    b, h, w, c = feats.shape
    k = probs.shape[-1]
    p = jax.nn.softmax(scale * probs.reshape(b, h * w, k), axis=1)
    f = feats.reshape(b, h * w, c)
    return jnp.einsum("bnk,bnc->bkc", p, f,
                      preferred_element_type=jnp.float32)


class _KeyProj(nn.Module):
    """1x1 conv + frozen BN + relu (xN) shared shape for f_pixel etc."""

    features: int
    depth: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = conv1x1(self.features, use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(FrozenBatchNorm(self.features, name=f"bn{i}")(x))
        return x


class SpatialOCR(nn.Module):
    """Object-context attention + projection (ocr.py:30-141).
    Dropout(0.05) is inference-disabled, matching frozen-BN eval."""

    in_channels: int
    key_channels: int

    @nn.compact
    def __call__(self, feats: jax.Array, proxy: jax.Array) -> jax.Array:
        b, h, w, c = feats.shape
        query = _KeyProj(self.key_channels, 2, name="f_pixel")(feats)
        key = _KeyProj(self.key_channels, 2, name="f_object")(
            proxy[:, :, None, :])                      # (B, K, 1, kc)
        value = _KeyProj(self.key_channels, 1, name="f_down")(
            proxy[:, :, None, :])

        q = query.reshape(b, h * w, self.key_channels)
        kk = key.reshape(b, -1, self.key_channels)
        v = value.reshape(b, -1, self.key_channels)
        sim = jnp.einsum("bnc,bkc->bnk", q, kk,
                         preferred_element_type=jnp.float32)
        sim = jax.nn.softmax(sim * self.key_channels ** -0.5, axis=-1)
        ctx = jnp.einsum("bnk,bkc->bnc", sim, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(b, h, w, self.key_channels)
        ctx = _KeyProj(self.in_channels, 1, name="f_up")(ctx)

        out = jnp.concatenate([ctx, feats], axis=-1)
        out = conv1x1(self.in_channels, use_bias=False,
                      name="proj_conv")(out)
        return nn.relu(FrozenBatchNorm(self.in_channels,
                                       name="proj_bn")(out))


class FBRSHRNetModel(nn.Module):
    """DistMaps + rgb_conv + HRNet-OCR (is_hrnet_model.py:24-66).

    Same call contract as FBRSDeepLabModel (models/fbrs.py), including
    the head_input/head_replay split consumed by the on-device f-BRS-B
    optimizer (interactive/fbrs_predictor.py): scale/bias insert on the
    concatenated stride-4 HRNet features, replaying only the OCR heads
    (the reference's HRNetFeatureBRSPredictor, brs.py:143-225)."""

    width: int = 18
    ocr_width: int = 64
    small: bool = False
    norm_radius: float = 260.0
    max_points: int = 24

    def setup(self):
        self.rgb_conv_0 = conv1x1(8)
        self.rgb_conv_bn = FrozenBatchNorm(8)
        self.rgb_conv_1 = conv1x1(3)
        self.feature_extractor = HighResolutionNet(
            self.width, 1, self.ocr_width, self.small)

    def _backbone_input(self, image: jax.Array,
                        points: jax.Array) -> jax.Array:
        h, w = image.shape[1:3]
        coord = dist_maps(points, h, w, self.norm_radius)
        x = jnp.concatenate([image, coord], axis=-1)
        x = self.rgb_conv_0(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = self.rgb_conv_bn(x)
        return self.rgb_conv_1(x)

    def head_input(self, image: jax.Array, points: jax.Array) -> jax.Array:
        """-> (B, H/4, W/4, 15*width) features: HRNet insertion mode 'A'
        (f-BRS-A and f-BRS-B both map here, reference
        predictors/__init__.py:63 + brs.py:146-160)."""
        return self.feature_extractor(self._backbone_input(image, points),
                                      mode="features")

    def head_replay(self, feats: jax.Array, out_hw) -> jax.Array:
        out, _aux = self.feature_extractor(feats, mode="head")
        return up_ac(out, out_hw)

    def head_input_ocr(self, image: jax.Array,
                       points: jax.Array) -> jax.Array:
        """HRNet insertion mode 'C' (f-BRS-C, reference brs.py:215-225):
        cache the 2*ocr_width object-context features; only cls_head
        replays per L-BFGS evaluation."""
        feats = self.feature_extractor(self._backbone_input(image, points),
                                       mode="features")
        return self.feature_extractor(feats, mode="ocr_features")

    def head_replay_cls(self, feats: jax.Array, out_hw) -> jax.Array:
        return up_ac(self.feature_extractor(feats, mode="cls"), out_hw)

    def __call__(self, image: jax.Array, points: jax.Array,
                 with_aux: bool = False):
        """image (B, H, W, 3) normalized; points (B, 2P, 2) (y, x)."""
        h, w = image.shape[1:3]
        out, aux = self.feature_extractor(
            self._backbone_input(image, points))
        out = up_ac(out, (h, w))
        if with_aux:
            return out, up_ac(aux, (h, w))
        return out


def init_params(model: FBRSHRNetModel, key, image, points,
                init_flavor: str = "default"):
    """Construct params for a from-scratch hrnet model; see
    models/initializer.py::init_model_params for the flavors."""
    from mivos_tpu.models.initializer import init_model_params

    return init_model_params(model, key, image, points,
                             init_flavor=init_flavor)
