"""Weight initializers (reference: fbrs/model/initializer.py).

flax init functions: `bilinear` reproduces the transposed-conv
upsampling kernel (initializer.py:47-76) and `xavier_gluon` the
magnitude-scaled gluon Xavier (initializer.py:79-105). Used when
training interactive-seg models from scratch; converted checkpoints
bypass them.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_kernel(key, shape, dtype=jnp.float32) -> jax.Array:
    """HWIO transposed-conv kernel performing bilinear upsampling.
    Requires kh == kw and in == out channels (per-channel upsampling)."""
    kh, kw, cin, cout = shape
    assert kh == kw, shape
    f = math.ceil(kh / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    og = np.ogrid[:kh, :kw]
    filt = ((1 - abs(og[0] / f - c)) * (1 - abs(og[1] / f - c))) \
        .astype(np.float32)
    w = np.zeros(shape, np.float32)
    for i in range(min(cin, cout)):
        w[:, :, i, i] = filt
    return jnp.asarray(w, dtype)


def xavier_gluon(rnd_type: str = "uniform", factor_type: str = "avg",
                 magnitude: float = 3.0):
    """Gluon-style Xavier: factor from fan_in/fan_out ('avg'/'in'/'out'),
    scale sqrt(magnitude / factor)."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:       # HWIO conv kernel
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        elif len(shape) == 2:     # dense
            fan_in, fan_out = shape[0], shape[1]
        else:
            fan_in = fan_out = int(np.prod(shape))
        factor = {"avg": (fan_in + fan_out) / 2.0,
                  "in": float(fan_in),
                  "out": float(fan_out)}[factor_type]
        scale = math.sqrt(magnitude / max(factor, 1.0))
        if rnd_type == "uniform":
            return jax.random.uniform(key, shape, dtype, -scale, scale)
        return jax.random.normal(key, shape, dtype) * scale

    return init
