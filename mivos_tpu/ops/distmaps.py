"""Click distance maps for interactive segmentation.

Replaces BOTH native paths of the reference (SURVEY.md section 2.9):
the Cython multi-source BFS (fbrs/utils/cython/_get_dist_maps.pyx) and
the closed-form GPU meshgrid path (fbrs/model/ops.py:55-76) become one
jit-able XLA op: per pixel, the min over clicks of the normalized squared
euclidean distance, then tanh(2*sqrt(d)).

Click tensor layout matches the reference predictor contract
(fbrs/inference/predictors/base.py:76-94): (B, 2*P, 2) rows of (y, x),
first P positive then P negative, padded with (-1, -1); padding P to a
bucket keeps click-count growth retrace-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dist_maps(points: jax.Array, height: int, width: int,
              norm_radius: float, spatial_scale: float = 1.0) -> jax.Array:
    """points: (B, 2P, 2) float (y, x); invalid rows have max(coord) < 0.
    Returns (B, H, W, 2) features: channel 0 from the first P (positive)
    rows, channel 1 from the last P (negative) rows."""
    b, p2, _ = points.shape
    p = p2 // 2
    rows = jnp.arange(height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32)
    denom = norm_radius * spatial_scale
    dy = (rows[None, None, :, None] -
          points[..., 0:1, None] * spatial_scale) / denom   # (B, 2P, H, 1)
    dx = (cols[None, None, None, :] -
          points[..., 1:2, None].transpose(0, 1, 3, 2) * spatial_scale) / denom
    d2 = dy * dy + dx * dx                                  # (B, 2P, H, W)
    invalid = jnp.max(points, axis=-1) < 0                  # (B, 2P)
    d2 = jnp.where(invalid[..., None, None], 1e6, d2)
    d2 = d2.reshape(b, 2, p, height, width).min(axis=2)     # (B, 2, H, W)
    feat = jnp.tanh(2.0 * jnp.sqrt(d2))
    return feat.transpose(0, 2, 3, 1)                       # NHWC


def pad_points(pos, neg, max_points: int) -> jax.Array:
    """Host helper: pos/neg lists of (y, x) -> (1, 2*max_points, 2) array
    with (-1, -1) padding (reference base.py:85-93)."""
    import numpy as np

    out = np.full((1, 2 * max_points, 2), -1.0, np.float32)
    for i, (y, x) in enumerate(pos[:max_points]):
        out[0, i] = (y, x)
    for i, (y, x) in enumerate(neg[:max_points]):
        out[0, max_points + i] = (y, x)
    return jnp.asarray(out)
