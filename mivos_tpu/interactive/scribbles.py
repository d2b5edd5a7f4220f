"""DAVIS interactive scribble protocol utilities.

Implements the subset of the `davisinteractive` package's scribble
handling that the pipeline needs (the package is not vendored):
  * scribbles2mask — rasterize normalized scribble paths into an indexed
    map (background = -1), matching
    davisinteractive.utils.scribbles.scribbles2mask as used by the
    reference (davis_processor.py:50).
  * is_empty / annotated_frames helpers for session bookkeeping.

Scribble JSON schema: {'scribbles': [frame_0_lines, frame_1_lines, ...]}
where each line is {'path': [[x, y], ...] in [0,1]^2, 'object_id': int}.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def scribbles2mask(scribbles: Dict, output_resolution: Tuple[int, int],
                   default_value: int = -1,
                   thickness: int = 1) -> np.ndarray:
    """Rasterize every frame's scribble lines into (T, H, W) int maps."""
    h, w = output_resolution
    frames = scribbles["scribbles"]
    out = np.full((len(frames), h, w), default_value, dtype=np.int32)
    for ti, lines in enumerate(frames):
        for line in lines:
            path = np.asarray(line["path"], dtype=np.float64)
            if len(path) == 0:
                continue
            obj = int(line["object_id"])
            pts = np.round(path * np.asarray([w - 1, h - 1])).astype(np.int32)
            if len(pts) == 1:
                out[ti, pts[0][1], pts[0][0]] = obj
                continue
            for a, b in zip(pts[:-1], pts[1:]):
                cv2.line(out[ti], tuple(a), tuple(b), obj,
                         thickness=thickness)
    return out


def annotated_frames(scribbles: Dict) -> List[int]:
    return [i for i, s in enumerate(scribbles["scribbles"]) if len(s) > 0]


def is_empty(scribbles: Dict) -> bool:
    return len(annotated_frames(scribbles)) == 0


def select_single_frame(scribbles: Dict) -> Tuple[Dict, int]:
    """Keep only the (first) annotated frame — the reference's frame
    selection in to_mask (davis_processor.py:42-47). Returns the reduced
    scribble dict and the frame index."""
    for idx, s in enumerate(scribbles["scribbles"]):
        if len(s) != 0:
            return {**scribbles, "scribbles": [s]}, idx
    return scribbles, 0


def mask_to_scribble(mask: np.ndarray, frame: int, num_frames: int,
                     num_points: int = 20,
                     rng: Optional[np.random.RandomState] = None) -> Dict:
    """Synthesize a scribble inside each object of an indexed mask —
    used by the evaluation robot and tests. Draws a crude path along
    interior points (max-distance-transform ordering)."""
    rng = rng or np.random.RandomState(0)
    h, w = mask.shape
    lines = []
    for obj in np.unique(mask):
        region = (mask == obj).astype(np.uint8)
        dt = cv2.distanceTransform(region, cv2.DIST_L2, 3)
        ys, xs = np.nonzero(dt > max(1.0, 0.3 * dt.max()))
        if len(ys) == 0:
            ys, xs = np.nonzero(region)
        if len(ys) == 0:
            continue
        sel = rng.choice(len(ys), size=min(num_points, len(ys)),
                         replace=False)
        order = np.argsort(xs[sel] * h + ys[sel])
        path = [[xs[sel][i] / (w - 1), ys[sel][i] / (h - 1)] for i in order]
        lines.append({"path": path, "object_id": int(obj),
                      "start_time": 0, "end_time": 1})
    frames = [[] for _ in range(num_frames)]
    frames[frame] = lines
    return {"scribbles": frames, "annotated_frame": frame}
