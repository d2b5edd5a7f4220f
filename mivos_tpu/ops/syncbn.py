"""Cross-device synchronized batch normalization.

Replaces the reference's ~420-line C++/CUDA SyncBN extension with its
master/worker queue protocol (fbrs/model/syncbn/, SURVEY.md section 2.9):
on TPU the cross-replica (sum x, sum x^2) exchange is a single psum over
the data mesh axis, and autodiff falls out of the functional form — no
custom backward kernels needed (XLA differentiates the 4-phase structure
the CUDA code hand-writes).

Use inside shard_map/jit with a named mesh axis, e.g.:

    stats-sync:  y, (mean, var) = sync_batch_norm(x, scale, bias, "data")
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def batch_norm_stats(x: jax.Array,
                     axis_name: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (mean, var) of NHWC x over batch+spatial dims, reduced
    across `axis_name` replicas when given (biased variance, matching
    torch BN training semantics)."""
    reduce_axes = tuple(range(x.ndim - 1))
    # Single fused pass: E[x] and E[x^2] (the CUDA kernel's phase 1).
    s1 = jnp.mean(x, axis=reduce_axes)
    s2 = jnp.mean(jnp.square(x), axis=reduce_axes)
    if axis_name is not None:
        s1 = jax.lax.pmean(s1, axis_name)
        s2 = jax.lax.pmean(s2, axis_name)
    return s1, s2 - jnp.square(s1)


def sync_batch_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    axis_name: Optional[str] = None,
                    eps: float = 1e-5) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Normalize x (NHWC) with batch statistics synchronized across the
    named mesh axis. Returns (y, (mean, var)) — the stats feed running-
    average updates in the caller."""
    mean, var = batch_norm_stats(x, axis_name)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * (inv * scale) + bias
    return y, (mean, var)
