"""Training-visualization montages (reference: util/image_saver.py).

Builds a captioned grid of the fusion-training tensors for TensorBoard
image logging (`pool_fusion`, reference :124-150, logged from
model/fusion_model.py:101-112). All inputs NHWC numpy.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from mivos_tpu.data.transforms import im_denormalize


def _resize(im: np.ndarray, size: Optional[Tuple[int, int]]) -> np.ndarray:
    import cv2

    if im.ndim == 2:
        im = im[..., None]
    if size is not None and im.shape[:2] != size:
        im = cv2.resize(im, (size[1], size[0]),
                        interpolation=cv2.INTER_NEAREST)
        if im.ndim == 2:
            im = im[..., None]
    return np.clip(im.astype(np.float32), 0, 1)


def get_image_array(images: Dict[str, List[np.ndarray]],
                    cell: Tuple[int, int],
                    captions: Optional[Dict[str, str]] = None) -> np.ndarray:
    """Rows = dict keys (captioned), columns = list entries
    (reference image_saver.py:47-84). cell = (h, w) of one tile."""
    import cv2

    captions = captions or {}
    h, w = cell
    n_rows = len(images)
    n_cols = len(next(iter(images.values())))
    out = np.zeros([h * n_rows, w * (n_cols + 1), 3], np.uint8)
    font = cv2.FONT_HERSHEY_SIMPLEX
    for row, (key, tiles) in enumerate(images.items()):
        caption = captions.get(key, key)
        for i, line in enumerate(caption.split("\n")):
            cv2.putText(out, line, (10, row * h + 40 + i * 40), font,
                        0.8 if h > 200 else 0.4, (255, 255, 255),
                        2 if h > 200 else 1, cv2.LINE_AA)
        for col, img in enumerate(tiles):
            img = _resize(img, (h, w))
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            out[row * h:(row + 1) * h,
                (col + 1) * w:(col + 2) * w] = (img * 255).astype(np.uint8)
    return out


def pool_fusion(batch: Dict[str, np.ndarray],
                size: Tuple[int, int] = (192, 192),
                max_rows: int = 4) -> np.ndarray:
    """Montage of the fusion training batch: images, the two propagated
    segmentations per object, attention maps, network outputs, and GT
    (reference image_saver.py:124-150). Expects the train-step's batch
    plus 'mask' (K+1-channel aggregated output) / 'attn1' / 'attn2'."""
    req: Dict[str, List[np.ndarray]] = defaultdict(list)
    b = min(max_rows, batch["gt"].shape[0])
    for i in range(b):
        req["RGB"].append(_resize(im_denormalize(batch["rgb"][i]), size))
        req["S11"].append(_resize(batch["seg1"][i], size))
        req["S21"].append(_resize(batch["seg2"][i], size))
        req["S12"].append(_resize(batch["seg12"][i], size))
        req["S22"].append(_resize(batch["seg22"][i], size))
        if "attn1" in batch:
            req["Pos Attn1"].append(_resize(batch["attn1"][i, ..., 0], size))
            req["Neg Attn1"].append(_resize(batch["attn1"][i, ..., 1], size))
            req["Pos Attn2"].append(_resize(batch["attn2"][i, ..., 0], size))
            req["Neg Attn2"].append(_resize(batch["attn2"][i, ..., 1], size))
        if "mask" in batch:
            req["MSK1"].append(_resize(batch["mask"][i, ..., 1], size))
            req["MSK2"].append(_resize(batch["mask"][i, ..., 2], size))
        req["GT1"].append(_resize(batch["gt"][i], size))
        req["GT2"].append(_resize(batch["gt2"][i], size))
    return get_image_array(req, size)
