"""Interactive scribbles robot + local DAVIS-interactive session.

Self-contained stand-in for the external `davisinteractive` package the
reference drives its benchmark with (eval_interactive_davis.py:74-108):
a deterministic simulated user that scribbles on the worst-predicted
frame, plus a session object with the same next/get_scribbles/
submit_masks surface, so the full 8-round protocol runs (and is unit
tested) without the package. Where `davisinteractive` is installed,
`mivos_tpu.eval.davis_interactive` still uses the official bot; this
module is the hermetic fallback and the regression-test harness.

Robot behavior mirrors the official InteractiveScribblesRobot: pick the
frame with the worst region metric, take each object's largest
misclassified region, skeletonize it (Zhang-Suen thinning), and emit
the longest skeleton path as a normalized scribble polyline.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from mivos_tpu.eval.davis_metrics import (db_eval_iou, sequence_jf,
                                          summarize_session)

_NEIGHBORS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
              (0, 1), (1, -1), (1, 0), (1, 1)]


def zhang_suen_thin(mask: np.ndarray, max_iters: int = 500) -> np.ndarray:
    """Morphological thinning to a 1-px-wide 8-connected skeleton
    (vectorized Zhang-Suen; the official robot uses
    skimage.morphology.skeletonize for the same purpose)."""
    img = np.ascontiguousarray(mask.astype(np.uint8))
    for _ in range(max_iters):
        changed = False
        for step in (0, 1):
            p = np.pad(img, 1)
            P2, P3 = p[:-2, 1:-1], p[:-2, 2:]
            P4, P5 = p[1:-1, 2:], p[2:, 2:]
            P6, P7 = p[2:, 1:-1], p[2:, :-2]
            P8, P9 = p[1:-1, :-2], p[:-2, :-2]
            ring = [P2, P3, P4, P5, P6, P7, P8, P9, P2]
            B = P2 + P3 + P4 + P5 + P6 + P7 + P8 + P9
            A = np.zeros_like(B)
            for i in range(8):
                A += (ring[i] == 0) & (ring[i + 1] == 1)
            if step == 0:
                cond = ((P2 * P4 * P6) == 0) & ((P4 * P6 * P8) == 0)
            else:
                cond = ((P2 * P4 * P8) == 0) & ((P2 * P6 * P8) == 0)
            kill = (img == 1) & (B >= 2) & (B <= 6) & (A == 1) & cond
            if kill.any():
                img[kill] = 0
                changed = True
        if not changed:
            break
    return img.astype(bool)


def _longest_skeleton_path(skel: np.ndarray) -> np.ndarray:
    """Longest simple path through the skeleton's pixel graph via the
    double-BFS tree-diameter heuristic. Returns (N, 2) [row, col]."""
    ys, xs = np.nonzero(skel)
    if len(ys) == 0:
        return np.zeros((0, 2), np.int64)
    pix = set(zip(ys.tolist(), xs.tolist()))

    def bfs(start):
        parent = {start: None}
        order = [start]
        head = 0
        while head < len(order):
            cy, cx = order[head]
            head += 1
            for dy, dx in _NEIGHBORS:
                nxt = (cy + dy, cx + dx)
                if nxt in pix and nxt not in parent:
                    parent[nxt] = (cy, cx)
                    order.append(nxt)
        return order[-1], parent

    far, _ = bfs((int(ys[0]), int(xs[0])))
    end, parent = bfs(far)
    path = []
    node = end
    while node is not None:
        path.append(node)
        node = parent[node]
    return np.asarray(path[::-1], np.int64)


class InteractiveScribblesRobot:
    """Deterministic scribble generator (official robot semantics:
    worst frame -> largest per-object error blob -> skeleton path)."""

    def __init__(self, min_nb_nodes: int = 4, nb_points: int = 25,
                 min_blob_px: int = 16):
        self.min_nb_nodes = min_nb_nodes
        self.nb_points = nb_points
        self.min_blob_px = min_blob_px

    def select_frame(self, pred: np.ndarray, gt: np.ndarray,
                     num_objects: int,
                     candidates: Optional[Sequence[int]] = None) -> int:
        """Frame with the worst mean region J over objects."""
        frames = list(candidates) if candidates else range(pred.shape[0])
        scores = []
        for ti in frames:
            js = [db_eval_iou(gt[ti] == k, pred[ti] == k)
                  for k in range(1, num_objects + 1)]
            scores.append(float(np.mean(js)))
        return int(list(frames)[int(np.argmin(scores))])

    def _object_scribble(self, error: np.ndarray,
                         obj: int, h: int, w: int) -> Optional[Dict]:
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            error.astype(np.uint8), connectivity=8)
        if n <= 1:
            return None
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        if stats[largest, cv2.CC_STAT_AREA] < self.min_blob_px:
            return None
        # Erode one step first: keeps the scribble strictly interior,
        # as the official robot's safety margin does.
        blob = (labels == largest).astype(np.uint8)
        eroded = cv2.erode(blob, np.ones((3, 3), np.uint8))
        if eroded.sum() >= self.min_blob_px:
            blob = eroded
        path = _longest_skeleton_path(zhang_suen_thin(blob))
        if len(path) < self.min_nb_nodes:
            # Symmetric blobs (e.g. squares) thin to a point — fall back
            # to a polyline along the distance-transform ridge, which is
            # interior by construction.
            dt = cv2.distanceTransform(blob, cv2.DIST_L2, 3)
            ys, xs = np.nonzero(dt >= max(1.0, 0.5 * dt.max()))
            if len(ys) < self.min_nb_nodes:
                return None
            order = np.argsort(ys * (w + 1) + xs)
            path = np.stack([ys[order], xs[order]], axis=1)
        if len(path) < self.min_nb_nodes:
            return None
        if len(path) > self.nb_points:
            sel = np.linspace(0, len(path) - 1, self.nb_points).astype(int)
            path = path[sel]
        return {"path": [[c / max(w - 1, 1), r / max(h - 1, 1)]
                         for r, c in path],
                "object_id": int(obj), "start_time": 0, "end_time": 0}

    def interact(self, pred: np.ndarray, gt: np.ndarray, num_objects: int,
                 candidates: Optional[Sequence[int]] = None,
                 sequence: str = "") -> Dict:
        """pred/gt: (T, H, W) label maps. Returns a scribble dict in the
        schema interactive/scribbles.py consumes. Round 0 (pred all
        zeros) reduces to scribbling each GT object — the protocol's
        human initial scribbles."""
        t, h, w = gt.shape
        idx = self.select_frame(pred, gt, num_objects, candidates)
        lines = []
        for obj in range(num_objects + 1):   # 0 = background corrections
            error = (gt[idx] == obj) & (pred[idx] != obj)
            line = self._object_scribble(error, obj, h, w)
            if line is not None:
                lines.append(line)
        frames: List[List[Dict]] = [[] for _ in range(t)]
        frames[idx] = lines
        return {"scribbles": frames, "annotated_frame": idx,
                "sequence": sequence}


class LocalInteractiveSession:
    """Hermetic DavisInteractiveSession: same driving surface
    (next / get_scribbles / submit_masks / get_global_summary), robot
    user, J&F bookkeeping, wall-clock timing per interaction."""

    def __init__(self, sequences: Dict[str, Tuple[np.ndarray, int]],
                 max_nb_interactions: int = 8,
                 max_time: Optional[float] = None,
                 robot: Optional[InteractiveScribblesRobot] = None):
        """sequences: name -> (gt_labels (T, H, W), num_objects)."""
        self.sequences = dict(sequences)
        self.max_rounds = max_nb_interactions
        self.max_time = (max_time if max_time is not None
                         else 30.0 * max_nb_interactions)
        self.robot = robot or InteractiveScribblesRobot()
        self._order = list(self.sequences)
        self._seq_i = -1
        self._round = 0
        self._new_seq = False
        self._pred: Optional[np.ndarray] = None
        self._next_frames: Optional[List[int]] = None
        self._t0: Optional[float] = None
        self._elapsed = 0.0
        self._history: List[Dict] = []       # this sequence's scribbles
        self.records: Dict[str, List[Tuple[float, float]]] = {}

    # -- context manager --------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    # -- protocol ----------------------------------------------------
    def next(self) -> bool:
        if self._seq_i >= 0 and self._round < self.max_rounds \
                and self._elapsed < self.max_time:
            self._new_seq = False
            return True
        self._seq_i += 1
        if self._seq_i >= len(self._order):
            return False
        gt, _k = self.sequences[self._order[self._seq_i]]
        self._round = 0
        self._elapsed = 0.0
        self._pred = np.zeros_like(gt)
        self._next_frames = None
        self._new_seq = True
        self._history = []
        self.records[self._order[self._seq_i]] = []
        return True

    def get_scribbles(self, only_last: bool = True):
        """only_last=True: this round's robot scribbles. only_last=False:
        all rounds' scribbles for the sequence merged per frame (the
        DavisInteractiveSession surface this mirrors)."""
        name = self._order[self._seq_i]
        gt, k = self.sequences[name]
        scribbles = self.robot.interact(self._pred, gt, k,
                                        candidates=self._next_frames,
                                        sequence=name)
        self._history.append(scribbles)
        self._t0 = time.monotonic()
        if not only_last and len(self._history) > 1:
            frames = [[] for _ in range(gt.shape[0])]
            for scr in self._history:
                for ti, lines in enumerate(scr["scribbles"]):
                    frames[ti] = frames[ti] + lines
            scribbles = {**scribbles, "scribbles": frames}
        return name, scribbles, self._new_seq

    def submit_masks(self, pred_masks: np.ndarray,
                     next_frames: Optional[Sequence[int]] = None) -> None:
        name = self._order[self._seq_i]
        gt, k = self.sequences[name]
        self._elapsed += time.monotonic() - (self._t0 or time.monotonic())
        self._pred = np.asarray(pred_masks)
        self._next_frames = (list(next_frames)
                             if next_frames is not None
                             and len(next_frames) > 0 else None)
        self.records[name].append(
            (self._elapsed, sequence_jf(self._pred, gt, k)))
        self._round += 1

    def get_report(self) -> Dict[str, List[Tuple[float, float]]]:
        return {k: list(v) for k, v in self.records.items()}

    def get_global_summary(self, save_file: Optional[str] = None) -> Dict:
        summary = summarize_session(self.records, max_time=self.max_time)
        summary["auc_jf"] = summary["auc"]
        if save_file:
            import json
            with open(save_file, "w") as f:
                json.dump(summary, f, indent=2)
        return summary
