"""DAVIS evaluation metrics: region J, boundary F, session AUC.

Self-contained reimplementation of the metric semantics the reference
delegates to the external `davisinteractive`/`davis2017-evaluation`
packages (reference eval_interactive_davis.py:104-108 reads AUC-J&F and
J&F@60s from the session report; the packages are not vendored here).

  * J (region similarity): intersection-over-union of the binary masks;
    1.0 when both masks are empty.
  * F (boundary accuracy): precision/recall of the two boundary maps
    matched within a tolerance radius of 0.8% of the image diagonal.
  * Session summary: a time-vs-(J&F) step curve per sequence sampled on
    a common grid; AUC is the normalized area under the averaged curve
    and metric@60s its value at t=60.

All host-side numpy/cv2 — metrics run on downloaded label maps, never
on device.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import cv2
import numpy as np


def db_eval_iou(gt: np.ndarray, pred: np.ndarray) -> float:
    """Region similarity J for one binary mask pair; both-empty = 1."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    union = np.logical_or(gt, pred).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(gt, pred).sum()) / float(union)


def _boundary_map(mask: np.ndarray) -> np.ndarray:
    """Foreground pixels with a background 4-neighbour (image border
    counts as background)."""
    m = mask.astype(bool)
    padded = np.pad(m, 1, mode="constant", constant_values=False)
    interior = (padded[:-2, 1:-1] & padded[2:, 1:-1]
                & padded[1:-1, :-2] & padded[1:-1, 2:])
    return m & ~interior


def db_eval_boundary(gt: np.ndarray, pred: np.ndarray,
                     bound_th: float = 0.008) -> float:
    """Boundary F-measure with a match radius of bound_th * diagonal
    (bound_th > 1 is an absolute pixel radius)."""
    h, w = gt.shape
    r = (int(math.ceil(bound_th)) if bound_th > 1
         else int(math.ceil(bound_th * math.hypot(h, w))))
    gt_b = _boundary_map(gt)
    pr_b = _boundary_map(pred)
    n_gt, n_pr = int(gt_b.sum()), int(pr_b.sum())
    if n_gt == 0 and n_pr == 0:
        return 1.0
    if n_gt == 0 or n_pr == 0:
        return 0.0
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1, 2 * r + 1))
    gt_d = cv2.dilate(gt_b.astype(np.uint8), se).astype(bool)
    pr_d = cv2.dilate(pr_b.astype(np.uint8), se).astype(bool)
    precision = float((pr_b & gt_d).sum()) / n_pr
    recall = float((gt_b & pr_d).sum()) / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def batched_jf(pred: np.ndarray, gt: np.ndarray,
               num_objects: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-object, per-frame J and F for (T, H, W) label maps.
    Returns (J, F) each of shape (num_objects, T); object ids 1..K."""
    t = pred.shape[0]
    J = np.zeros((num_objects, t))
    F = np.zeros((num_objects, t))
    for k in range(1, num_objects + 1):
        for ti in range(t):
            g, p = gt[ti] == k, pred[ti] == k
            J[k - 1, ti] = db_eval_iou(g, p)
            F[k - 1, ti] = db_eval_boundary(g, p)
    return J, F


def sequence_jf(pred: np.ndarray, gt: np.ndarray, num_objects: int) -> float:
    """Mean of J and F over all objects and frames — the per-round
    scalar the interactive protocol tracks."""
    J, F = batched_jf(pred, gt, num_objects)
    return float((J.mean() + F.mean()) / 2.0)


def _step_interp(times: Sequence[float], values: Sequence[float],
                 grid: np.ndarray) -> np.ndarray:
    """Piecewise-constant curve: value at t = last submitted metric at
    or before t (0 before the first submission)."""
    out = np.zeros_like(grid)
    for t_i, v in zip(times, values):        # times ascending
        out[grid >= t_i] = v
    return out


def summarize_session(records: Dict[str, List[Tuple[float, float]]],
                      max_time: float, metric_at: float = 60.0,
                      n_samples: int = 200) -> Dict:
    """records: per sequence, the ascending [(cumulative_time, J&F)]
    trajectory — one entry per interaction round. Returns
    {auc, metric_at_threshold, curve: (grid, mean_values)}."""
    grid = np.linspace(0.0, max_time, n_samples)
    curves = [_step_interp([t for t, _ in traj], [v for _, v in traj], grid)
              for traj in records.values()]
    mean_curve = (np.mean(np.stack(curves), axis=0) if curves
                  else np.zeros_like(grid))
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2
    auc = float(trapezoid(mean_curve, grid) / max(max_time, 1e-9))
    at = float(np.interp(metric_at, grid, mean_curve))
    return {"auc": auc, f"metric_at_{int(metric_at)}s": at,
            "curve": {"time": grid.tolist(),
                      "metric": mean_curve.tolist()}}
