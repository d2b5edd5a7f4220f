"""Scribble-to-mask controller (reference: interact/s2m_controller.py and
the DAVIS variant in davis_processor.py:38-70).

TPU-native difference: all K objects run as ONE batched S2M forward
(the reference loops objects one by one), and the 6-channel input
assembly happens inside the jitted function.
"""
from __future__ import annotations

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.models.s2m import S2MNetwork
from mivos_tpu.ops.aggregate import aggregate_wbg
from mivos_tpu.utils.tensor import pad_divide_by

_KERNEL3 = np.ones((3, 3), np.uint8)


@functools.lru_cache(maxsize=4)
def _s2m_apply(net: S2MNetwork):
    @jax.jit
    def run(params, image, prev_hard, srb):
        """image (H, W, 3); prev_hard (K, H, W, 1) hard previous masks;
        srb (K, H, W, 2) pos/neg scribble channels. Returns (K, H, W, 1)
        sigmoid probabilities."""
        k = prev_hard.shape[0]
        im = jnp.broadcast_to(image[None], (k,) + image.shape)
        x = jnp.concatenate([im, prev_hard, srb], axis=-1)  # (K, H, W, 6)
        return jax.nn.sigmoid(net.apply(params, x))

    return run


class S2MController:
    """ignore_class is usually 255 for GUI scribbles and -1 for DAVIS
    protocol scribbles; 0 is the (real) background label."""

    def __init__(self, s2m_net: S2MNetwork, params, num_objects: int,
                 ignore_class: int = 255, dilate_radius: int = 0):
        self.net = s2m_net
        self.params = params
        self.num_objects = num_objects
        self.ignore_class = ignore_class
        self.dilate_radius = dilate_radius
        self._run = _s2m_apply(s2m_net)

    def _scribble_channels(self, scr_mask: np.ndarray) -> np.ndarray:
        """(h, w) indexed scribble map -> (K, h, w, 2) float pos/neg."""
        k = self.num_objects
        out = np.zeros((k,) + scr_mask.shape + (2,), np.float32)
        for ki in range(1, k + 1):
            p = (scr_mask == ki).astype(np.uint8)
            n = ((scr_mask != ki) & (scr_mask != self.ignore_class)) \
                .astype(np.uint8)
            if self.dilate_radius > 0:
                # DAVIS protocol thickens 1px scribbles (davis_processor.py:53-60)
                p = cv2.dilate(p, _KERNEL3)
                n = cv2.dilate(n, _KERNEL3)
            out[ki - 1, ..., 0] = p
            out[ki - 1, ..., 1] = n
        return out

    def interact(self, image: jax.Array, prev_mask, scr_mask: np.ndarray,
                 aggregate_hard: bool = False):
        """image: (H, W, 3) PADDED normalized frame. prev_mask: (H, W)
        indexed hard mask (PADDED). scr_mask: (h, w) UNPADDED indexed
        scribble map. Returns (K, H, W, 1) per-object probabilities, or
        the hard-aggregated (K+1, ...) distribution if aggregate_hard."""
        srb = jnp.asarray(self._scribble_channels(scr_mask))
        srb, _ = pad_divide_by(srb, 16)
        prev = jnp.asarray(prev_mask)
        k_ids = jnp.arange(1, self.num_objects + 1)
        prev_hard = (prev[None] == k_ids[:, None, None])[..., None] \
            .astype(jnp.float32)
        prob = self._run(self.params, image, prev_hard, srb)
        if aggregate_hard:
            return aggregate_wbg(prob, keep_bg=True, hard=True)
        return prob
