"""Auxiliary utilities: palette, overlay, integrator, timer, image grid."""
import time

import numpy as np

from mivos_tpu.utils.image_saver import get_image_array, pool_fusion
from mivos_tpu.utils.integrator import Integrator
from mivos_tpu.utils.palette import (overlay_davis, pascal_color_map,
                                     save_indexed_png)
from mivos_tpu.utils.timer import Timer


class TestPalette:
    def test_voc_colors(self):
        cmap = pascal_color_map()
        # Canonical VOC entries: bg black, class1 maroon, class2 green.
        assert cmap[0].tolist() == [0, 0, 0]
        assert cmap[1].tolist() == [128, 0, 0]
        assert cmap[2].tolist() == [0, 128, 0]

    def test_indexed_png_roundtrip(self, tmp_path):
        from PIL import Image

        lab = np.zeros((10, 10), np.uint8)
        lab[2:5, 2:5] = 3
        p = str(tmp_path / "m.png")
        save_indexed_png(p, lab)
        back = np.asarray(Image.open(p).convert("P"))
        np.testing.assert_array_equal(back, lab)

    def test_overlay_marks_mask_and_contour(self, rng):
        img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
        mask = np.zeros((20, 20), np.uint8)
        mask[5:15, 5:15] = 1
        out = overlay_davis(img, mask)
        assert out.shape == img.shape
        # contour pixels are black
        assert out[5, 5].tolist() == [0, 0, 0]
        # untouched background unchanged
        np.testing.assert_array_equal(out[0, 0], img[0, 0])
        faded = overlay_davis(img, mask, fade=True)
        assert (faded[0, 0] <= img[0, 0]).all()


class TestIntegrator:
    def test_mean_and_hooks_and_hidden(self):
        logged = []

        class L:
            def log_metrics(self, p, k, v, it, f=None):
                logged.append((p, k, v))

        integ = Integrator(L(), distributed=False)
        integ.add_hook(lambda v: ("iou", v["hide_i"] / v["hide_u"]))
        for i, u in [(1.0, 2.0), (3.0, 4.0)]:
            integ.add_dict({"loss": i, "hide_i": i, "hide_u": u})
        out = integ.finalize("train", 100)
        assert abs(out["loss"] - 2.0) < 1e-6
        assert abs(out["iou"] - (4.0 / 6.0)) < 1e-6
        keys = [k for _, k, _ in logged]
        assert "loss" in keys and "iou" in keys
        assert not any(k.startswith("hide") for k in keys)


class TestTimer:
    def test_pause_accumulates(self):
        t = Timer().start()
        time.sleep(0.02)
        t.pause()
        frozen = t.count()
        time.sleep(0.02)
        assert t.count() == frozen
        t.start()
        time.sleep(0.01)
        assert t.count() > frozen
        assert isinstance(str(t), str)


class TestImageSaver:
    def test_grid_layout(self, rng):
        imgs = {"A": [rng.rand(32, 32, 3)] * 2, "B": [rng.rand(32, 32, 1)] * 2}
        grid = get_image_array(imgs, (64, 64))
        assert grid.shape == (128, 192, 3)

    def test_pool_fusion_montage(self, rng):
        b, h, w = 2, 48, 48
        batch = {
            "rgb": rng.rand(b, h, w, 3).astype(np.float32),
            "seg1": rng.rand(b, h, w, 1).astype(np.float32),
            "seg2": rng.rand(b, h, w, 1).astype(np.float32),
            "seg12": rng.rand(b, h, w, 1).astype(np.float32),
            "seg22": rng.rand(b, h, w, 1).astype(np.float32),
            "gt": rng.rand(b, h, w, 1).astype(np.float32),
            "gt2": rng.rand(b, h, w, 1).astype(np.float32),
            "attn1": rng.rand(b, h, w, 2).astype(np.float32),
            "attn2": rng.rand(b, h, w, 2).astype(np.float32),
            "mask": rng.rand(b, h, w, 3).astype(np.float32),
        }
        grid = pool_fusion(batch, size=(64, 64))
        assert grid.dtype == np.uint8
        assert grid.shape[0] == 13 * 64  # 13 captioned rows
        assert grid.shape[1] == (b + 1) * 64


class TestInitializers:
    def test_bilinear_kernel_interpolates(self):
        import jax
        import jax.numpy as jnp

        from mivos_tpu.models.initializer import bilinear_kernel

        w = bilinear_kernel(jax.random.PRNGKey(0), (4, 4, 2, 2))
        assert w.shape == (4, 4, 2, 2)
        # per-channel kernels, zero cross-channel
        assert float(jnp.abs(w[:, :, 0, 1]).max()) == 0
        # center weights dominate (separable triangle)
        assert float(w[1, 1, 0, 0]) > float(w[0, 0, 0, 0])

    def test_xavier_gluon_scale(self):
        import jax
        import numpy as np

        from mivos_tpu.models.initializer import xavier_gluon

        init = xavier_gluon("uniform", "avg", magnitude=3.0)
        w = np.asarray(init(jax.random.PRNGKey(0), (3, 3, 16, 32)))
        rf = 9
        bound = (3.0 / ((16 * rf + 32 * rf) / 2)) ** 0.5
        assert np.abs(w).max() <= bound + 1e-6
        assert w.std() > bound / 4  # actually filled, roughly uniform


class TestVis:
    def test_draw_with_blend_and_clicks(self, rng):
        from mivos_tpu.interactive.clicker import Click
        from mivos_tpu.utils.vis import draw_with_blend_and_clicks

        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        clicks = [Click(True, (16, 16)), Click(False, (4, 28))]
        out = draw_with_blend_and_clicks(img, mask, clicks_list=clicks)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)  # blended + click markers
