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


def bilinear_resize_align_corners(x: jax.Array,
                                  out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics (used by
    the f-BRS subsystem throughout, e.g. fbrs/model/is_deeplab_model.py:63):
    output grid point i maps to input coordinate i * (in-1)/(out-1).

    Implemented as two 1-D interpolation matmuls (dense (out, in) weights)
    — on TPU this is MXU work instead of gathers, and the weight matrices
    are tiny constants folded at compile time.
    """
    def interp_matrix(n_in: int, n_out: int) -> jax.Array:
        if n_out == 1 or n_in == 1:
            return jnp.ones((n_out, n_in)) / n_in if n_out == 1 else \
                jnp.ones((n_out, 1)).repeat(n_in, 1) / n_in
        src = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w_hi = src - lo
        m = jnp.zeros((n_out, n_in))
        m = m.at[jnp.arange(n_out), lo].add(1.0 - w_hi)
        m = m.at[jnp.arange(n_out), hi].add(w_hi)
        return m

    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    my = interp_matrix(h, oh)
    mx = interp_matrix(w, ow)
    x = jnp.einsum("oh,...hwc->...owc", my, x)
    return jnp.einsum("pw,...owc->...opc", mx, x)


def area_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Mean-pool (..., H, W, C) by an integer factor (torch mode='area')."""
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(-4, -2))
