"""Crops tiled-inference transform + tiled predictor.

Reference: fbrs/inference/transforms/crops.py:10-90 — for images larger
than the network's window, predict on overlapping fixed-size crops and
average the per-pixel predictions, normalized by how many crops cover
each pixel; clicks are re-indexed into every crop's frame (clicks
outside a crop still contribute their distance field, exactly like the
reference's closed-form DistMaps path).

TPU-native rework: every crop has the SAME (crop_h, crop_w) shape, so
all crops (and their horizontal flips) batch through ONE jitted forward
— one dispatch per interaction instead of one per crop, and a single
executable regardless of image size. The count-normalized paste-back is
also a single jitted scatter-add over the crop axis.
"""
from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.interactive.clicker import Click
from mivos_tpu.interactive.fbrs_predictor import CLICK_BUCKETS
from mivos_tpu.utils.tensor import next_bucket


def get_offsets(length: int, crop_size: int,
                min_overlap_ratio: float = 0.2) -> List[int]:
    """Crop start offsets covering `length` with at least
    `min_overlap_ratio` overlap (reference crops.py:77-90)."""
    if length == crop_size:
        return [0]
    n = (length / crop_size - min_overlap_ratio) / (1 - min_overlap_ratio)
    n = math.ceil(n)
    overlap_ratio = (n - length / crop_size) / (n - 1)
    overlap_width = int(crop_size * overlap_ratio)
    offsets = [0]
    for _ in range(1, n):
        new_offset = offsets[-1] + crop_size - overlap_width
        if new_offset + crop_size > length:
            new_offset = length - crop_size
        offsets.append(new_offset)
    return offsets


class Crops:
    """Overlapping-crop transform (reference crops.py:10-75).

    transform: (1, H, W, 3) image + clicks -> (N, ch, cw, 3) crop batch
    + per-crop shifted click lists. inv_transform: (N, h, w, 1) crop
    probabilities -> (1, H, W, 1) count-normalized average.
    """

    def __init__(self, crop_size: Tuple[int, int] = (320, 480),
                 min_overlap: float = 0.2):
        self.crop_height, self.crop_width = crop_size
        self.min_overlap = min_overlap
        self.reset()

    def reset(self):
        self.x_offsets: Optional[List[int]] = None
        self.y_offsets: Optional[List[int]] = None
        self._counts: Optional[np.ndarray] = None
        self._image_hw: Optional[Tuple[int, int]] = None
        self._iy = self._ix = None

    @property
    def offsets(self) -> List[Tuple[int, int]]:
        return [(dy, dx) for dy in self.y_offsets for dx in self.x_offsets]

    def transform(self, image: jax.Array, clicks: List[Click]):
        h, w = image.shape[1:3]
        self._counts = None
        if h < self.crop_height or w < self.crop_width:
            return image, [clicks]

        self.x_offsets = get_offsets(w, self.crop_width, self.min_overlap)
        self.y_offsets = get_offsets(h, self.crop_height, self.min_overlap)
        self._image_hw = (h, w)

        counts = np.zeros((h, w), np.float32)
        crops = []
        clicks_lists = []
        iy, ix = [], []
        grid_y, grid_x = np.mgrid[:self.crop_height, :self.crop_width]
        for dy, dx in self.offsets:
            counts[dy:dy + self.crop_height, dx:dx + self.crop_width] += 1
            crops.append(image[0, dy:dy + self.crop_height,
                               dx:dx + self.crop_width])
            iy.append(grid_y + dy)
            ix.append(grid_x + dx)
            clicks_lists.append([
                Click(c.is_positive, (c.coords[0] - dy, c.coords[1] - dx))
                for c in clicks])
        self._counts = counts
        # Flat destination indices for the one-dispatch scatter paste.
        self._iy = jnp.asarray(np.concatenate([a.ravel() for a in iy]))
        self._ix = jnp.asarray(np.concatenate([a.ravel() for a in ix]))
        return jnp.stack(crops), clicks_lists

    def inv_transform(self, prob: jax.Array) -> jax.Array:
        """prob: (N, ch, cw, 1) per-crop probabilities (or (1, H, W, 1)
        passthrough when the image was smaller than the window). ONE
        jitted scatter-add over precomputed flat indices — per-crop
        .at[].add() updates cost a dispatch + full-image copy each."""
        if self._counts is None:
            return prob
        return _paste(prob, self._iy, self._ix,
                      jnp.asarray(self._counts))

    def get_state(self):
        return (self.x_offsets, self.y_offsets, self._counts,
                self._image_hw, self._iy, self._ix)

    def set_state(self, state):
        (self.x_offsets, self.y_offsets, self._counts, self._image_hw,
         self._iy, self._ix) = state


@jax.jit
def _paste(prob: jax.Array, iy: jax.Array, ix: jax.Array,
           counts: jax.Array) -> jax.Array:
    """(N, ch, cw, C) crop probs -> (1, H, W, C) count-normalized sum."""
    flat = prob.reshape(-1, prob.shape[-1])
    out = jnp.zeros(counts.shape + (prob.shape[-1],), prob.dtype)
    out = out.at[iy, ix].add(flat)
    return (out / counts[..., None])[None]


@functools.lru_cache(maxsize=4)
def _tiled_fns(net):
    @jax.jit
    def forward(p, crops, points):
        """crops (B, ch, cw, 3), points (B, 2P, 2) -> (B, ch, cw, 1)
        sigmoid probabilities, flip-averaged over the two halves of the
        batch (first half originals, second half mirrored)."""
        logits = net.apply(p, crops, points)
        prob = jax.nn.sigmoid(logits)
        n = prob.shape[0] // 2
        return 0.5 * (prob[:n] + prob[n:, :, ::-1])

    return forward


class TiledPredictor:
    """NoC-harness-compatible predictor that runs count-normalized tiled
    inference: ALL crops (plus flips) go through one jitted forward.
    Interface mirrors FeatureBRSPredictor (set_input_image /
    get_prediction / get_states / set_states)."""

    def __init__(self, net, params, crop_size: Tuple[int, int] = (320, 480),
                 min_overlap: float = 0.2, net_clicks_limit: int = 8):
        self.net = net
        self.params = params
        self.crops = Crops(crop_size, min_overlap)
        self.net_clicks_limit = net_clicks_limit
        self._forward = _tiled_fns(net)
        self.original_image = None

    def set_input_image(self, image: jax.Array):
        self.original_image = jnp.asarray(image)[None]
        self.crops.reset()

    def _points_nd(self, clicks_lists: Sequence[List[Click]]) -> jax.Array:
        limit = self.net_clicks_limit
        pos = [[c.coords for c in cl[:limit] if c.is_positive]
               for cl in clicks_lists]
        neg = [[c.coords for c in cl[:limit] if not c.is_positive]
               for cl in clicks_lists]
        p = next_bucket(max(max(map(len, pos)), max(map(len, neg)), 1),
                        CLICK_BUCKETS)
        arr = np.full((len(clicks_lists), 2 * p, 2), -1.0, np.float32)
        for i, (ps, ns) in enumerate(zip(pos, neg)):
            if ps:
                arr[i, :len(ps)] = ps
            if ns:
                arr[i, p:p + len(ns)] = ns
        return jnp.asarray(arr)

    def get_prediction(self, clicker) -> jax.Array:
        clicks = clicker.get_clicks()
        crops, clicks_lists = self.crops.transform(self.original_image,
                                                   clicks)
        w = crops.shape[2]
        points = self._points_nd(clicks_lists)
        # Mirror x for every REAL click — including out-of-crop ones
        # whose shifted x is negative (their mirrored distance field
        # must come from w-1-x, not a phantom click at the edge). Only
        # the (-1,-1) padding sentinel (both coords negative) keeps its
        # coordinates; a true click up-left of a crop shares that
        # encoding and is dropped by the distance op in both halves —
        # at crop distances its field is tanh-saturated ~constant, so
        # the loss vs the reference is negligible.
        is_click = (points[..., 0] >= 0) | (points[..., 1] >= 0)
        fpoints = points.at[..., 1].set(
            jnp.where(is_click, w - 1 - points[..., 1], points[..., 1]))
        batch = jnp.concatenate([crops, crops[:, :, ::-1]], axis=0)
        bpoints = jnp.concatenate([points, fpoints], axis=0)
        prob = self._forward(self.params, batch, bpoints)
        prob = self.crops.inv_transform(prob)
        return prob[0, ..., 0]

    def get_states(self):
        return {"transform_states": self.crops.get_state()}

    def set_states(self, states):
        self.crops.set_state(states["transform_states"])
