"""Rasterized synthetic video: textured moving blobs with ground truth.

Self-contained stand-in for real VOS data (the sandbox has no DAVIS/
BL30K archives) used to (a) pretrain the propagation / S2M nets to
confident, peaked predictions for the fast-vs-exact accuracy envelope,
and (b) drive the full interactive protocol on hardware. The motion
model mirrors the reference's BL30K generator design at raster level
(polynomial trajectories + min-separation sampling, reference
generation/blender/generate_yaml.py, gen_utils.py:28-41) without the
Blender dependency.

Everything is plain numpy, deterministic per (seed, index).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _texture(rng: np.random.RandomState, h: int, w: int, cell: int,
             base: Optional[np.ndarray] = None) -> np.ndarray:
    """Smooth random RGB texture in [0, 1]: low-res noise upsampled by
    `cell` (piecewise-constant cells keep edges the encoders can key
    on), optionally tinted toward a base color."""
    lo = rng.rand(-(-h // cell), -(-w // cell), 3).astype(np.float32)
    up = np.kron(lo, np.ones((cell, cell, 1), np.float32))[:h, :w]
    if base is not None:
        up = 0.5 * up + 0.5 * base[None, None, :]
    return up


def _poly_track(rng: np.random.RandomState, t: int, lo: float, hi: float,
                degree: int = 3) -> np.ndarray:
    """Degree-`degree` polynomial through random control points,
    clipped to [lo, hi] (BL30K uses degree-4 polynomial trajectories,
    reference generation/blender/generate_yaml.py)."""
    ctrl_t = np.linspace(0, 1, degree + 1)
    ctrl_v = rng.uniform(lo, hi, degree + 1)
    coef = np.polyfit(ctrl_t, ctrl_v, degree)
    return np.clip(np.polyval(coef, np.linspace(0, 1, t)), lo, hi)


def synthetic_sequence(seed: int, t: int, h: int, w: int,
                       num_objects: int = 2,
                       min_radius: float = 0.10, max_radius: float = 0.22,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """One video: returns (images (T,H,W,3) float32 in [0,1],
    labels (T,H,W) int32 with 0 = background, 1..K = objects).

    Each object is a rotating ellipse with its own texture moving along
    a smooth polynomial trajectory; later object ids occlude earlier
    ones (a stable depth order, like BL30K's fixed object stack).
    """
    rng = np.random.RandomState(seed)
    bg = _texture(rng, h, w, cell=max(8, min(h, w) // 16))
    drift = rng.randint(1, 4)

    span = float(min(h, w))
    objs = []
    for k in range(num_objects):
        objs.append({
            "cy": _poly_track(rng, t, 0.2 * h, 0.8 * h),
            "cx": _poly_track(rng, t, 0.2 * w, 0.8 * w),
            "ang": _poly_track(rng, t, 0, 2 * np.pi, degree=2),
            "ra": span * rng.uniform(min_radius, max_radius),
            "rb": span * rng.uniform(min_radius, max_radius),
            "tex": _texture(rng, h, w, cell=max(4, min(h, w) // 24),
                            base=rng.rand(3).astype(np.float32)),
        })

    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    images = np.empty((t, h, w, 3), np.float32)
    labels = np.zeros((t, h, w), np.int32)
    for ti in range(t):
        frame = np.roll(bg, drift * ti, axis=1).copy()
        lab = np.zeros((h, w), np.int32)
        for k, o in enumerate(objs, start=1):
            dy, dx = yy - o["cy"][ti], xx - o["cx"][ti]
            c, s = np.cos(o["ang"][ti]), np.sin(o["ang"][ti])
            u, v = c * dx + s * dy, -s * dx + c * dy
            mask = (u / o["ra"]) ** 2 + (v / o["rb"]) ** 2 < 1.0
            frame[mask] = o["tex"][mask]
            lab[mask] = k
        images[ti] = np.clip(frame + 0.02 * rng.randn(h, w, 3), 0, 1)
        labels[ti] = lab
    return images, labels


def labels_to_onehot(labels: np.ndarray, num_objects: int) -> np.ndarray:
    """(H, W) int labels -> (K, H, W, 1) float32 per-object masks."""
    return np.stack([(labels == k).astype(np.float32)
                     for k in range(1, num_objects + 1)])[..., None]


def degrade_mask(rng: np.random.RandomState, mask: np.ndarray,
                 max_shift: int = 6) -> np.ndarray:
    """A plausibly-wrong previous mask: random shift + morphological
    noise, the input distribution S2M sees at correction time."""
    out = np.roll(mask, (rng.randint(-max_shift, max_shift + 1),
                         rng.randint(-max_shift, max_shift + 1)),
                  axis=(0, 1))
    if rng.rand() < 0.3:
        out = np.zeros_like(out)  # sometimes no previous mask at all
    return out


def random_strokes(rng: np.random.RandomState, region: np.ndarray,
                   n_strokes: int = 2, thickness: int = 2) -> np.ndarray:
    """Thin random polylines inside a boolean region — synthetic
    scribbles (the robot's skeleton scribbles are the evaluation-time
    analog; reference davis_processor.py:53-60 dilates them 3x3)."""
    import cv2

    h, w = region.shape
    canvas = np.zeros((h, w), np.uint8)
    eroded = cv2.erode(region.astype(np.uint8),
                       np.ones((3, 3), np.uint8)).astype(bool)
    pool = eroded if eroded.sum() >= 8 else region
    ys, xs = np.nonzero(pool)
    if len(ys) == 0:
        return canvas.astype(bool)
    for _ in range(n_strokes):
        idx = rng.randint(0, len(ys), size=3)
        pts = [(int(xs[i]), int(ys[i])) for i in idx]
        for p0, p1 in zip(pts[:-1], pts[1:]):
            cv2.line(canvas, p0, p1, 1, thickness)
    return (canvas.astype(bool)) & region


def s2m_example(seed: int, h: int, w: int, num_objects: int = 2,
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One S2M training batch over objects: returns
    (x (K, H, W, 6), gt (K, H, W, 1), labels (H, W)).

    Channel layout matches the reference S2M input contract
    (s2m_controller.py:21-38): RGB + previous per-object mask +
    positive scribbles (inside the object's error/GT) + negative
    scribbles (inside the false-positive region or background).
    """
    rng = np.random.RandomState(seed)
    images, labels = synthetic_sequence(seed, 1, h, w, num_objects)
    img, lab = images[0], labels[0]
    xs, gts = [], []
    for k in range(1, num_objects + 1):
        gt = lab == k
        prev = degrade_mask(rng, gt)
        pos = random_strokes(rng, gt & ~prev if (gt & ~prev).sum() > 16
                             else gt)
        neg_region = prev & ~gt
        if neg_region.sum() < 16:
            neg_region = ~gt
        neg = random_strokes(rng, neg_region)
        x = np.concatenate([
            img,
            prev.astype(np.float32)[..., None],
            pos.astype(np.float32)[..., None],
            neg.astype(np.float32)[..., None],
        ], axis=-1)
        xs.append(x)
        gts.append(gt.astype(np.float32)[..., None])
    return np.stack(xs), np.stack(gts), lab


def prop_example(seed: int, t_gap: int, h: int, w: int,
                 num_objects: int = 2,
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One propagation training pair from a short synthetic clip:
    (ref_img (H,W,3), ref_masks (K,H,W,1), q_img (H,W,3),
    q_masks (K,H,W,1))."""
    images, labels = synthetic_sequence(seed, t_gap + 1, h, w, num_objects)
    return (images[0], labels_to_onehot(labels[0], num_objects),
            images[t_gap], labels_to_onehot(labels[t_gap], num_objects))


def prop_clip(seed: int, n_steps: int, h: int, w: int,
              num_objects: int = 2, max_gap: int = 5,
              ) -> Tuple[np.ndarray, np.ndarray]:
    """A chained-propagation training clip: `n_steps + 1` frames sampled
    at random temporal gaps (1..max_gap, mirroring a mem_freq-5 session's
    commit spacing) from one synthetic sequence.

    Returns (imgs (S+1, H, W, 3), masks (S+1, K, H, W, 1)). Frame 0 is
    the "interacted" frame (GT mask); frames 1..S are successive
    propagation targets for multi-step training where the net memorizes
    its OWN predictions (the reference's main-training recipe — its STM
    trainer segments frame t from memory of its own frame t-1 output —
    which single-pair training lacks, causing mid-sequence drift)."""
    rng = np.random.RandomState(seed)
    gaps = rng.randint(1, max_gap + 1, size=n_steps)
    idx = np.concatenate([[0], np.cumsum(gaps)])
    # Sample from a >=30-frame sequence (the envelope/protocol clip
    # scale) at a random offset: trajectories traverse their range over
    # the FULL sequence, so a short t_total would make per-frame motion
    # several times faster than any deployment video.
    t_total = max(30, int(idx[-1]) + 1)
    start = rng.randint(0, t_total - int(idx[-1]))
    images, labels = synthetic_sequence(seed, t_total, h, w, num_objects)
    sel = start + idx
    return (images[sel],
            np.stack([labels_to_onehot(labels[i], num_objects)
                      for i in sel]))


def fbrs_example(seed: int, h: int, w: int, n_points: int = 8,
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One f-BRS click-training sample: (image (H, W, 3) float32 [0,1],
    gt (H, W) float32 binary mask, points (2P, 2) float32 (y, x)).

    Points use the DistMaps layout (models/fbrs.py, reference
    fbrs/model/ops.py:46-80): positive clicks fill the first P rows,
    negatives the second P, -1 padding elsewhere. Sampling loosely
    follows the reference training strategy (saic-vul fbrs points
    sampler): the first positive click at the object's interior
    distance-transform peak (what the evaluation Clicker also does on
    an empty prediction, interactive/clicker.py), extra positives
    uniform inside the object, negatives uniform over the background
    with a bias to a boundary band.
    """
    import cv2

    rng = np.random.RandomState(seed)
    images, labels = synthetic_sequence(seed, 1, h, w, num_objects=1,
                                        min_radius=0.12, max_radius=0.30)
    image, gt = images[0], (labels[0] == 1).astype(np.float32)
    p = n_points
    pts = np.full((2 * p, 2), -1.0, np.float32)
    dt = cv2.distanceTransform(gt.astype(np.uint8), cv2.DIST_L2, 3)
    cy, cx = np.unravel_index(int(np.argmax(dt)), dt.shape)
    pts[0] = (cy, cx)
    ys, xs = np.nonzero(gt > 0)
    n_pos = rng.randint(1, min(4, p) + 1)
    for i in range(1, n_pos):
        j = rng.randint(len(ys))
        pts[i] = (ys[j], xs[j])
    band = cv2.dilate(gt.astype(np.uint8),
                      np.ones((9, 9), np.uint8)).astype(bool) & (gt == 0)
    n_neg = rng.randint(0, min(3, p) + 1)
    for i in range(n_neg):
        region = band if (rng.rand() < 0.5 and band.sum() > 0) else gt == 0
        bys, bxs = np.nonzero(region)
        j = rng.randint(len(bys))
        pts[p + i] = (bys[j], bxs[j])
    return image, gt, pts
