"""Interpolation ops with PyTorch-compatible semantics, NHWC layout.

The reference uses F.interpolate in two modes:
  - bilinear, align_corners=False (decoder upsampling, attention maps):
    half-pixel-center sampling, which is exactly jax.image.resize's
    'linear' convention.
  - 'area' (downsampling masks by the /16 feature stride): with integer
    factors this is mean pooling, implemented here as a reshape-mean
    (pure data movement + VPU reduce; no gather).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_resize(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., h, w, C).

    Matches torch F.interpolate(mode='bilinear', align_corners=False) for
    upsampling (both use half-pixel centers; antialias is irrelevant when
    scaling up).
    """
    shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def upsample2x(x: jax.Array) -> jax.Array:
    h, w = x.shape[-3], x.shape[-2]
    return bilinear_resize(x, (h * 2, w * 2))


def area_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Mean-pool (..., H, W, C) by an integer factor (torch mode='area')."""
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(-4, -2))
