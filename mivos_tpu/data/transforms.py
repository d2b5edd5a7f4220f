"""Host-side image transforms for the data layer.

NHWC numpy throughout (the framework's device layout), explicit RNG
everywhere. The reference pairs its random augmentations across streams
by re-seeding the *global* torch/python RNG before every stream
(dataset/reseed.py, fusion_dataset.py:153-200); here the random
parameters are sampled ONCE into an `AugParams` value and applied to
every stream — same pairing guarantee, no global state, safe under
parallel workers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

# ImageNet statistics (reference dataset/range_transform.py:1-13).
IM_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IM_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
# Mean fill color for geometric transforms (range_transform.py:3).
IM_FILL = (124, 116, 104)


def im_normalize(img: np.ndarray) -> np.ndarray:
    """uint8/float [0,255]-or-[0,1] HWC RGB -> normalized float32."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return (img - IM_MEAN) / IM_STD


def im_denormalize(img: np.ndarray) -> np.ndarray:
    """Inverse of im_normalize, clipped to [0, 1]
    (reference inv_im_trans, range_transform.py:10-12)."""
    return np.clip(np.asarray(img, np.float32) * IM_STD + IM_MEAN, 0.0, 1.0)


def all_to_onehot(masks: np.ndarray, labels: Sequence[int]) -> np.ndarray:
    """(T, H, W) label maps -> (K, T, H, W) uint8 one-hot planes
    (reference dataset/onehot_util.py:4-8)."""
    out = np.zeros((len(labels),) + masks.shape, dtype=np.uint8)
    for k, l in enumerate(labels):
        out[k] = (masks == l).astype(np.uint8)
    return out


def resize_min_side(img: np.ndarray, target: int,
                    interpolation: Optional[int] = None) -> np.ndarray:
    """Resize so the SHORTER side equals `target`, preserving aspect
    (the reference's 480p policy, yv_test_dataset.py:103-108)."""
    import cv2

    h, w = img.shape[:2]
    if h > w:
        size = (target, h * target // w)   # (w, h) for cv2
    else:
        size = (w * target // h, target)
    interp = interpolation if interpolation is not None else cv2.INTER_AREA
    return cv2.resize(img, size, interpolation=interp)


@dataclasses.dataclass(frozen=True)
class AugParams:
    """One sample's paired augmentation (reference fusion_dataset.py
    transforms: RandomHorizontalFlip + RandomCrop(384) +
    ColorJitter(0.1, 0.03, 0.03, 0.01), :57-78)."""

    flip: bool
    crop_y: int
    crop_x: int
    crop_size: int
    brightness: float
    contrast: float
    saturation: float
    hue: float

    @staticmethod
    def sample(rng: np.random.Generator, h: int, w: int,
               crop_size: int = 384) -> "AugParams":
        ch = min(crop_size, h)
        cw = min(crop_size, w)
        return AugParams(
            flip=bool(rng.random() < 0.5),
            crop_y=int(rng.integers(0, h - ch + 1)),
            crop_x=int(rng.integers(0, w - cw + 1)),
            crop_size=crop_size,
            brightness=float(rng.uniform(0.9, 1.1)),
            contrast=float(rng.uniform(0.97, 1.03)),
            saturation=float(rng.uniform(0.97, 1.03)),
            hue=float(rng.uniform(-0.01, 0.01)),
        )


def apply_geometric(img: np.ndarray, p: AugParams) -> np.ndarray:
    """Paired flip + crop, valid for images and masks (HW or HWC)."""
    if p.flip:
        img = img[:, ::-1]
    ch = min(p.crop_size, img.shape[0])
    cw = min(p.crop_size, img.shape[1])
    return np.ascontiguousarray(
        img[p.crop_y:p.crop_y + ch, p.crop_x:p.crop_x + cw])


def apply_color_jitter(img: np.ndarray, p: AugParams) -> np.ndarray:
    """Photometric jitter on a float [0,1] HWC RGB image. Same
    distribution family as torchvision ColorJitter (brightness/
    contrast/saturation multiplicative, hue additive in HSV)."""
    import cv2

    img = np.asarray(img, np.float32)
    img = np.clip(img * p.brightness, 0, 1)
    gray_mean = img.mean(axis=(0, 1), keepdims=True).mean()
    img = np.clip(gray_mean + p.contrast * (img - gray_mean), 0, 1)
    gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
    img = np.clip(gray[..., None] + p.saturation * (img - gray[..., None]),
                  0, 1)
    if abs(p.hue) > 1e-8:
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + p.hue * 360.0) % 360.0
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return img


def pick_480p_size(h: int, w: int) -> Tuple[int, int]:
    """480p target size preserving aspect (yv_test_dataset.py:103-106)."""
    if h > w:
        return (h * 480 // w, 480)
    return (480, w * 480 // h)
