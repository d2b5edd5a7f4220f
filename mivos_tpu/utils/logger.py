"""Training logger: console + TensorBoard event files.

Reference: util/logger.py (SummaryWriter + console echo, git
branch/sha stamped at startup). Here TensorBoard writing goes through
tf.summary when TensorFlow is importable and degrades to console-only
otherwise — no hard dependency.
"""
from __future__ import annotations

import os
import subprocess
import warnings
from typing import Optional

import numpy as np

from mivos_tpu.data.transforms import im_denormalize


def _git_stamp() -> str:
    try:
        branch = subprocess.run(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
        return f"{branch} {sha}"
    except Exception:
        return "unknown"


def _fix_width(x: float) -> str:
    return "{:.9s}".format("{:0.9f}".format(x))


class TensorboardLogger:
    """log_scalar/log_metrics/log_im/log_seg/log_string with the
    reference's console format (util/logger.py:52-102)."""

    def __init__(self, short_id: str, run_id: Optional[str],
                 log_root: str = "./log"):
        self.short_id = "DEBUG" if short_id == "NULL" else short_id
        self.no_log = run_id is None
        self._writer = None
        if not self.no_log:
            try:
                import tensorflow as tf

                self._writer = tf.summary.create_file_writer(
                    os.path.join(log_root, str(run_id)))
            except Exception:
                warnings.warn("TensorFlow unavailable; console-only logging")
        else:
            warnings.warn("Logging has been disabled.")
        self.log_string("git", _git_stamp())

    def log_scalar(self, tag: str, x: float, step: int) -> None:
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            tf.summary.scalar(tag, float(x), step=step)

    def log_metrics(self, l1: str, l2: str, val: float, step: int,
                    f=None) -> None:
        text = "{:s} - It {:6d} [{:5s}] [{:13}]: {:s}".format(
            self.short_id, step, l1.upper(), l2, _fix_width(float(val)))
        print(text)
        if f is not None:
            f.write(text + "\n")
            f.flush()
        self.log_scalar(l1 + "/" + l2, val, step)

    def _log_image(self, tag: str, img: np.ndarray, step: int) -> None:
        if self._writer is None:
            return
        import tensorflow as tf

        if img.ndim == 2:
            img = img[..., None]
        with self._writer.as_default():
            tf.summary.image(tag, img[None], step=step)

    def log_im(self, tag: str, x: np.ndarray, step: int) -> None:
        """ImageNet-normalized (H, W, 3) float -> uint8 image."""
        self._log_image(tag, (im_denormalize(x) * 255).astype(np.uint8), step)

    def log_seg(self, tag: str, x: np.ndarray, step: int) -> None:
        """[-1, 1]-normalized segmentation map."""
        self._log_image(tag, ((np.asarray(x) * 0.5 + 0.5) * 255)
                        .astype(np.uint8), step)

    def log_gray(self, tag: str, x: np.ndarray, step: int) -> None:
        self._log_image(tag, (np.clip(np.asarray(x), 0, 1) * 255)
                        .astype(np.uint8), step)

    def log_cv2(self, tag: str, x: np.ndarray, step: int) -> None:
        self._log_image(tag, np.asarray(x, np.uint8), step)

    def log_string(self, tag: str, x: str) -> None:
        print(tag, x)
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            tf.summary.text(tag, x, step=0)
