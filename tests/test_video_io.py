"""Video/image/mask loaders (reference interact/interactive_utils.py)."""
import os

import numpy as np
import pytest
from PIL import Image

from mivos_tpu.interactive.video_io import load_images, load_masks
from mivos_tpu.utils.profiling import annotate, trace


class TestLoaders:
    def test_load_images_resizes_min_side(self, tmp_path, rng):
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (120, 200, 3), np.uint8)).save(
                tmp_path / f"{i:05d}.jpg")
        frames = load_images(str(tmp_path), min_side=60)
        assert frames.shape == (3, 60, 100, 3)
        assert frames.dtype == np.uint8

    def test_load_masks_nearest(self, tmp_path):
        lab = np.zeros((40, 60), np.uint8)
        lab[10:30, 20:50] = 2
        img = Image.fromarray(lab, mode="P")
        img.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759)
        img.save(tmp_path / "00000.png")
        masks = load_masks(str(tmp_path), min_side=20)
        assert masks.shape == (1, 20, 30)
        assert set(np.unique(masks)) <= {0, 2}  # nearest keeps labels

    def test_empty_folder_raises(self, tmp_path):
        with pytest.raises(ValueError):
            load_images(str(tmp_path))


class TestProfiling:
    def test_trace_noop_without_dir(self):
        with trace(None):
            pass  # no profiler started

    def test_annotate_context(self):
        with annotate("phase"):
            x = np.ones(4).sum()
        assert x == 4
