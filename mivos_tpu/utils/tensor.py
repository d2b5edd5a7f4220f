"""Core tensor utilities: padding, one-hot, IoU.

TPU-native reimplementation of the utility layer of MiVOS
(reference: util/tensor_util.py). All functions are pure and jit-able;
layouts are NHWC (channels-last) which is the native TPU layout, unlike
the reference's NCHW.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Pad = Tuple[int, int, int, int]  # (left_w, right_w, top_h, bottom_h)


def cast_params_bf16(params):
    """Pre-cast conv weights to bfloat16 for inference, keeping frozen
    BatchNorm statistics (any module whose name contains 'bn') in fp32.

    flax casts fp32 params to the compute dtype at every call site;
    inside a scanned propagation pass that cast re-executes per frame
    (~the whole tower's weight bytes per step). Casting once up front
    removes it, and params already in bf16 flow through promote_dtype
    untouched."""
    def walk(tree, in_bn):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, in_bn or ("bn" in k.lower()))
            elif in_bn or v.dtype != jnp.float32:
                out[k] = v
            else:
                out[k] = v.astype(jnp.bfloat16)
        return out

    return walk(params, False)


@functools.lru_cache(maxsize=65536)
def dev_i32(v: int) -> jax.Array:
    """Cached scalar device_put. On remote-attached TPUs a host->device
    scalar transfer costs tens of ms; inference loops pass schedule
    scalars (bank row counts, write offsets) every frame, so they are
    interned here — the value set is small (multiples of the per-frame
    token count)."""
    return jnp.int32(v)


@functools.lru_cache(maxsize=16384)
def dev_i32_seq(vals: tuple) -> jax.Array:
    """Cached small int32 vector device_put (per-chunk bank-row
    schedules): the schedule is data-independent, so identical chunks
    across rounds/sessions reuse one device buffer instead of paying a
    host->device transfer each."""
    return jnp.asarray(np.asarray(vals, np.int32))


@functools.lru_cache(maxsize=65536)
def dev_f32_pair(a: float, b: float) -> jax.Array:
    """Cached (2,) float32 device constant (fusion time coefficients)."""
    return jnp.asarray([a, b], jnp.float32)


def compute_pad(h: int, w: int, d: int = 16) -> Pad:
    """Symmetric padding amounts that round (h, w) up to multiples of d.

    Matches the padding convention of the reference `pad_divide_by`
    (reference: util/tensor_util.py:62-80): the smaller half goes on the
    left/top. Returns (lw, uw, lh, uh).
    """
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh, uh = (new_h - h) // 2, (new_h - h) - (new_h - h) // 2
    lw, uw = (new_w - w) // 2, (new_w - w) - (new_w - w) // 2
    return (lw, uw, lh, uh)


def pad_divide_by(x: jax.Array, d: int = 16, hw_axes: Tuple[int, int] = (-3, -2)):
    """Pad spatial dims (NHWC: axes -3, -2) to multiples of d.

    Returns (padded, pad) with pad = (lw, uw, lh, uh). Static-shape: the
    pad amounts are Python ints derived from the static shape, so this
    traces to a fixed lax.pad.
    """
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    h, w = x.shape[h_ax], x.shape[w_ax]
    lw, uw, lh, uh = compute_pad(h, w, d)
    cfg = [(0, 0)] * x.ndim
    cfg[h_ax] = (lh, uh)
    cfg[w_ax] = (lw, uw)
    return jnp.pad(x, cfg), (lw, uw, lh, uh)


def unpad(x: jax.Array, pad: Pad, hw_axes: Tuple[int, int] = (-3, -2)) -> jax.Array:
    """Inverse of pad_divide_by (reference: util/tensor_util.py:82-94)."""
    lw, uw, lh, uh = pad
    h_ax = hw_axes[0] % x.ndim
    w_ax = hw_axes[1] % x.ndim
    idx = [slice(None)] * x.ndim
    if lh + uh > 0:
        idx[h_ax] = slice(lh, x.shape[h_ax] - uh)
    if lw + uw > 0:
        idx[w_ax] = slice(lw, x.shape[w_ax] - uw)
    return x[tuple(idx)]


def one_hot_mask(labels: jax.Array, num_objects: int) -> jax.Array:
    """Indexed label map (H, W) -> per-object masks (K, H, W, 1).

    Object ids are 1..num_objects; 0 is background (dropped).
    (reference: dataset/onehot_util.py)
    """
    k = jnp.arange(1, num_objects + 1)
    oh = (labels[None, :, :] == k[:, None, None]).astype(jnp.float32)
    return oh[..., None]


def labels_to_probs(labels: jax.Array, num_objects: int) -> jax.Array:
    """Indexed label map (H, W) -> (K+1, H, W, 1) hard probabilities
    with the derived background channel first — the InferenceCore
    interaction-mask convention (one_hot_mask plus bg = 1 - sum(fg))."""
    fg = one_hot_mask(labels, num_objects)
    bg = 1.0 - fg.sum(0, keepdims=True)
    return jnp.concatenate([bg, fg], axis=0)


def compute_iou(seg: jax.Array, gt: jax.Array, eps: float = 1e-6) -> jax.Array:
    """IoU of two boolean masks (reference: util/tensor_util.py:17-27)."""
    seg = seg.astype(jnp.bool_)
    gt = gt.astype(jnp.bool_)
    i = jnp.sum(jnp.logical_and(seg, gt).astype(jnp.float32))
    u = jnp.sum(jnp.logical_or(seg, gt).astype(jnp.float32))
    return (i + eps) / (u + eps)


def time_buckets(cap: int = 8192) -> Tuple[int, ...]:
    """Bucket ladder for the video-time axis. Device-resident frame
    stacks and the query cache are padded to these lengths so the
    in-scan frame gather (core/inference.py) compiles one executable
    per bucket, not per video length: ~1.25x geometric growth bounds
    overpad at 25% and bucket count at O(log T)."""
    out = [8]
    while out[-1] < cap:
        out.append(out[-1] + max(8, out[-1] // 4))
    return tuple(out)


def next_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n. Buckets must be ascending; the last bucket is a cap."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


def memory_buckets(cap: int = 512) -> Tuple[int, ...]:
    """Geometric bucket schedule for the memory-bank frame axis.

    Growing the bank re-traces jit at most O(log cap) times per process
    (and the traces are shared across videos); within a bucket the shapes
    are static so interactive rounds never retrace.
    """
    out = [1, 2, 4]
    while out[-1] < cap:
        out.append(out[-1] * 2)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("num_objects",))
def mask_to_label(prob: jax.Array, num_objects: int) -> jax.Array:
    """(K+1, H, W, 1) probabilities -> (H, W) uint8 argmax label map."""
    del num_objects
    return jnp.argmax(prob[..., 0], axis=0).astype(jnp.uint8)


def np_unpad_hw(arr: np.ndarray, pad: Pad) -> np.ndarray:
    """Host-side unpad for (..., H, W) numpy arrays."""
    lw, uw, lh, uh = pad
    if lh + uh > 0:
        arr = arr[..., lh: arr.shape[-2] - uh, :]
    if lw + uw > 0:
        arr = arr[..., :, lw: arr.shape[-1] - uw]
    return arr
