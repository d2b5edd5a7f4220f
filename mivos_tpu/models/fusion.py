"""Difference-aware fusion network (reference: model/fusion_net.py) and the
training-time attention reader (reference: model/attn_network.py).

FusionNet is a small residual CNN over a 9-channel input:
  RGB(3) + seg1(1) + seg2(1) + attn(2) + time-coefficients(2, broadcast).
It is the ONLY trainable module in the framework; everything else runs
frozen (reference model/fusion_model.py:199-200 keeps even this module's
BN — it has none — in eval).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.models.layers import KeyValue, conv3x3
from mivos_tpu.models.resnet import ResNet50
from mivos_tpu.ops.memory_read import (full_softmax_affinity,
                                       memory_read as _memory_read)
from mivos_tpu.ops.resize import area_downsample, bilinear_resize


class FusionNet(nn.Module):
    """9ch -> 32ch residual blocks -> 1ch logit (reference fusion_net.py:8-50)."""

    dtype: str = None

    @nn.compact
    def __call__(self, im, seg1, seg2, attn, time_coef):
        """im: (K, H, W, 3); seg1/seg2: (K, H, W, 1); attn: (K, H, W, 2);
        time_coef: (K, 2) broadcast over space. Returns (K, H, W, 1) logits."""
        k, h, w, _ = im.shape
        d = self.dtype
        t = jnp.broadcast_to(time_coef[:, None, None, :], (k, h, w, 2))
        x = jnp.concatenate([im, seg1, seg2, attn, t], axis=-1)
        x = nn.relu(conv3x3(32, name="conv1", dtype=d)(x))
        r = conv3x3(32, name="conv2_0", dtype=d)(x)
        r = conv3x3(32, name="conv2_1", dtype=d)(nn.relu(r))
        x = nn.relu(x + r)
        r = conv3x3(32, name="conv3_0", dtype=d)(x)
        r = conv3x3(32, name="conv3_1", dtype=d)(nn.relu(r))
        x = nn.relu(x + r)
        return conv3x3(1, name="final_conv", dtype=d)(x).astype(jnp.float32)


class AttentionReadNetwork(nn.Module):
    """Frozen training-time attention reader (reference attn_network.py:30-80).

    Structurally the propagation network's encoders + a full-softmax
    affinity; weights are loaded from the propagation checkpoint and
    never trained (stop_gradient enforces it functionally).
    """

    def setup(self):
        self.mask_rgb_encoder = ResNet50(in_chans=5, num_stages=3,
                                         conv_bias=True, name="mask_rgb_encoder")
        self.rgb_encoder = ResNet50(in_chans=3, num_stages=3, conv_bias=False,
                                    name="rgb_encoder")
        self.kv_m_f16 = KeyValue(128, 512, name="kv_m_f16")
        self.kv_q_f16 = KeyValue(128, 512, name="kv_q_f16")

    def _attention_map(self, f16, qk16, pos_mask, neg_mask):
        b, h, w, _ = pos_mask.shape
        h16, w16 = h // 16, w // 16
        k16, _ = self.kv_m_f16(f16)
        mk = k16.reshape(b, h16 * w16, 128)
        qk = qk16.reshape(b, h16 * w16, 128)
        # Per-sample affinity: (B, M, N), softmax over memory axis.
        aff = jax.vmap(lambda m, q: full_softmax_affinity(m[None], q)[0])(mk, qk)
        pos = area_downsample(pos_mask, 16).reshape(b, 1, h16 * w16)
        neg = area_downsample(neg_mask, 16).reshape(b, 1, h16 * w16)
        pos_map = jnp.einsum("bom,bmn->bon", pos, aff)
        neg_map = jnp.einsum("bom,bmn->bon", neg, aff)
        attn = jnp.concatenate([pos_map, neg_map], 1).reshape(b, 2, h16, w16)
        attn = attn.transpose(0, 2, 3, 1)
        return bilinear_resize(attn, (h, w))

    def __call__(self, image, mask11, mask21, mask12, mask22, query_image):
        """All inputs (B, H, W, C); masks are 1-channel. Returns the two
        objects' 2-channel attention maps (attn1, attn2)."""
        pos1 = jnp.clip(mask21 - mask11, 0, 1)
        neg1 = jnp.clip(mask11 - mask21, 0, 1)
        pos2 = jnp.clip(mask22 - mask12, 0, 1)
        neg2 = jnp.clip(mask12 - mask22, 0, 1)

        f16_1, _, _ = self.mask_rgb_encoder(
            jnp.concatenate([image, mask21, mask22], -1))
        f16_2, _, _ = self.mask_rgb_encoder(
            jnp.concatenate([image, mask22, mask21], -1))
        qf16, _, _ = self.rgb_encoder(query_image)
        qk16, _ = self.kv_q_f16(qf16)

        attn1 = self._attention_map(f16_1, qk16, pos1, neg1)
        attn2 = self._attention_map(f16_2, qk16, pos2, neg2)
        return (jax.lax.stop_gradient(attn1), jax.lax.stop_gradient(attn2))
