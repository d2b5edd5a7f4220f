"""Training losses (reference: model/losses.py).

BootstrappedCE redesigned for XLA: the reference selects the top-p
hardest pixels with torch.topk, whose size depends on the iteration
number — a dynamic shape. Here the same selection is expressed as a
*quantile threshold* + masked mean (identical value up to ties), so `it`
and `p` are traced scalars and the train step never retraces.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits: jax.Array, cls_gt: jax.Array) -> jax.Array:
    """logits (B, H, W, C), cls_gt (B, H, W) int -> (B, H, W) CE."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, cls_gt[..., None], axis=-1)[..., 0]


def bootstrap_fraction(it: jax.Array, start_warm: int, end_warm: int,
                       top_p: float = 0.15) -> jax.Array:
    """Annealed hard-pixel fraction (reference losses.py:29-39):
    1.0 before start_warm, top_p after end_warm, linear in between."""
    it = it.astype(jnp.float32)
    frac = top_p + (1.0 - top_p) * (end_warm - it) / (end_warm - start_warm)
    return jnp.where(it < start_warm, 1.0,
                     jnp.where(it > end_warm, top_p, frac))


def bootstrapped_ce(logits: jax.Array, cls_gt: jax.Array, it: jax.Array,
                    start_warm: int, end_warm: int,
                    top_p: float = 0.15) -> Tuple[jax.Array, jax.Array]:
    """Per-sample bootstrapped CE, averaged over the batch.

    logits: (B, H, W, C); cls_gt: (B, H, W). Returns (loss, p).
    """
    raw = _per_pixel_ce(logits, cls_gt)              # (B, H, W)
    b = raw.shape[0]
    flat = raw.reshape(b, -1)
    n = flat.shape[-1]
    p = bootstrap_fraction(it, start_warm, end_warm, top_p)
    # Exact top-(floor(n*p)) mean via a full descending sort + prefix mask
    # — k stays a *traced* value (the mask length changes, not the shape),
    # and matches torch.topk(int(n*p)).mean() exactly.
    sorted_desc = jnp.sort(flat, axis=-1)[..., ::-1]
    k = jnp.floor(n * p)
    mask = (jnp.arange(n, dtype=jnp.float32)[None, :] < k).astype(flat.dtype)
    loss = jnp.sum(sorted_desc * mask, axis=-1) / jnp.maximum(k, 1.0)
    return loss.mean(), p


def fusion_loss(logits: jax.Array, cls_gt: jax.Array, selector: jax.Array,
                it: jax.Array, start_warm: int, end_warm: int,
                top_p: float = 0.15) -> Tuple[jax.Array, jax.Array]:
    """Selector-aware loss (reference losses.py:57-61): samples without a
    second object only compete bg-vs-obj1. Instead of slicing logits to
    [:2] per sample (dynamic shape), the absent class's logit is masked
    to -1e9, which yields the identical 2-class log-softmax."""
    has_second = selector[:, 1] > 0.5                # (B,)
    neg = jnp.full_like(logits[..., 2], -1e9)
    l2 = jnp.where(has_second[:, None, None], logits[..., 2], neg)
    masked_logits = jnp.concatenate(
        [logits[..., :2], l2[..., None]], axis=-1)
    return bootstrapped_ce(masked_logits, cls_gt, it, start_warm, end_warm,
                           top_p)


def iou_sums(pred_mask: jax.Array, gt: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Intersection/union sums for the Integrator IoU hooks
    (reference util/tensor_util.py:5-9, model/losses.py:66-73)."""
    seg = pred_mask > 0.5
    g = gt > 0.5
    i = jnp.sum(jnp.logical_and(seg, g).astype(jnp.float32))
    u = jnp.sum(jnp.logical_or(seg, g).astype(jnp.float32))
    return i, u


def compute_fusion_losses(out: Dict[str, jax.Array],
                          batch: Dict[str, jax.Array], it: jax.Array,
                          start_warm: int, end_warm: int) -> Dict[str, jax.Array]:
    """Full metric dict (reference LossComputer.compute, losses.py:50-74).

    out['logits']/out['mask']: (B, H, W, 3) class-last.
    """
    loss, p = fusion_loss(out["logits"], batch["cls_gt"], batch["selector"],
                          it, start_warm, end_warm)
    i1, u1 = iou_sums(out["mask"][..., 1], batch["gt"][..., 0])
    i2, u2 = iou_sums(out["mask"][..., 2], batch["gt2"][..., 0])
    return {
        "total_loss": loss,
        "p": p,
        "hide_iou/i": i1, "hide_iou/u": u1,
        "hide_iou/sec_i": i2, "hide_iou/sec_u": u2,
    }
