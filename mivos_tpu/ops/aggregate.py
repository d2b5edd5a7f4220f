"""Multi-object soft aggregation (reference: model/aggregate.py).

Combines K per-object foreground probabilities into a (K+1)-way
distribution (background first) via logit-space softmax. Pure jnp;
operates on a leading object axis with arbitrary trailing dims, so the
same functions serve (K, H, W, 1) inference tensors and (B, K, H, W, 1)
training batches (use aggregate_wbg_channel for the latter).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _logit(p: jax.Array) -> jax.Array:
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return jnp.log(p / (1.0 - p))


def aggregate_wbg(prob: jax.Array, keep_bg: bool = False, hard: bool = False) -> jax.Array:
    """Aggregate with derived background: bg prob = prod(1 - p_k).

    prob: (K, ...) per-object foreground probabilities.
    Returns (K+1, ...) if keep_bg else (K, ...).
    `hard` multiplies logits by 1000 (a near-argmax, used for S2M outputs;
    reference: model/aggregate.py:30-32).
    """
    bg = jnp.prod(1.0 - prob, axis=0, keepdims=True)
    logits = _logit(jnp.concatenate([bg, prob], axis=0))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=0)
    return out if keep_bg else out[1:]


def aggregate_sbg(prob: jax.Array, keep_bg: bool = False, hard: bool = False) -> jax.Array:
    """Aggregate with a fixed background probability of 0.5
    (reference: model/aggregate.py:4-20)."""
    bg = jnp.full_like(prob[:1], 0.5)
    logits = _logit(jnp.concatenate([bg, prob], axis=0))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=0)
    return out if keep_bg else out[1:]


def aggregate_wbg_last(prob: jax.Array, keep_bg: bool = False, hard: bool = False):
    """Class-LAST variant for NHWC training batches: prob (B, H, W, K) ->
    (logits, softmax) of shape (B, H, W, K+1). Same math as
    aggregate_wbg_channel (reference model/aggregate.py:39-53)."""
    bg = jnp.prod(1.0 - prob, axis=-1, keepdims=True)
    logits = _logit(jnp.concatenate([bg, prob], axis=-1))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=-1)
    if keep_bg:
        return logits, out
    return logits, out[..., 1:]


def aggregate_wbg_channel(prob: jax.Array, keep_bg: bool = False, hard: bool = False):
    """Batched variant aggregating over axis 1; returns (logits, softmax)
    (reference: model/aggregate.py:39-53)."""
    bg = jnp.prod(1.0 - prob, axis=1, keepdims=True)
    logits = _logit(jnp.concatenate([bg, prob], axis=1))
    if hard:
        logits = logits * 1000.0
    out = jax.nn.softmax(logits, axis=1)
    if keep_bg:
        return logits, out
    return logits, out[:, 1:]
