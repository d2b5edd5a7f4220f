"""Crops tiled-inference transform: offsets/counts/click parity vs the
reference transform, count-normalized averaging, and whole-image
equivalence on a small case (reference fbrs/inference/transforms/
crops.py:10-90)."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mivos_tpu.interactive.clicker import Click, Clicker
from mivos_tpu.interactive.crops import Crops, TiledPredictor, get_offsets
from mivos_tpu.models.fbrs import FBRSDeepLabModel

from torch_oracle import install_reference_stubs

pytestmark = pytest.mark.skipif(not os.path.exists("/root/reference"),
                                reason="reference checkout not mounted")
install_reference_stubs()


class TestOffsets:
    @pytest.mark.parametrize("length,crop", [(480, 480), (481, 320),
                                             (640, 320), (1000, 480),
                                             (777, 320)])
    def test_matches_reference(self, length, crop):
        from fbrs.inference.transforms.crops import \
            get_offsets as ref_offsets

        got = get_offsets(length, crop)
        assert got == ref_offsets(length, crop)
        # full coverage, in-bounds
        assert got[0] == 0 and got[-1] + crop <= length
        covered = np.zeros(length, bool)
        for o in got:
            covered[o:o + crop] = True
        assert covered.all()


class TestCropsTransform:
    def test_matches_reference_transform(self, rng):
        """Crop batch, click shifts, and counts all agree with the
        reference Crops transform on an oversize image."""
        from fbrs.inference.transforms.crops import Crops as RefCrops

        h, w, ch, cw = 100, 150, 64, 96
        image = rng.rand(1, h, w, 3).astype(np.float32)
        clicks = [Click(True, (10.0, 20.0)), Click(False, (80.0, 140.0))]

        ours = Crops(crop_size=(ch, cw))
        crops, clicks_lists = ours.transform(jnp.asarray(image), clicks)

        ref = RefCrops(crop_size=(ch, cw))
        ref_crops, ref_clicks = ref.transform(
            torch.from_numpy(image.transpose(0, 3, 1, 2)),
            [[type("C", (), {"is_positive": c.is_positive,
                             "coords": c.coords})() for c in clicks]])

        assert crops.shape[0] == ref_crops.shape[0]
        np.testing.assert_allclose(
            np.asarray(crops).transpose(0, 3, 1, 2),
            ref_crops.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours._counts),
                                   ref._counts.numpy(), atol=0)
        for cl, rcl in zip(clicks_lists, ref_clicks):
            for c, rc in zip(cl, rcl):
                assert c.is_positive == rc.is_positive
                assert tuple(c.coords) == tuple(rc.coords)

    def test_inv_transform_matches_reference(self, rng):
        from fbrs.inference.transforms.crops import Crops as RefCrops

        h, w, ch, cw = 100, 150, 64, 96
        image = rng.rand(1, h, w, 3).astype(np.float32)
        ours = Crops(crop_size=(ch, cw))
        crops, _ = ours.transform(jnp.asarray(image), [])
        n = crops.shape[0]
        probs = rng.rand(n, ch, cw, 1).astype(np.float32)

        got = np.asarray(ours.inv_transform(jnp.asarray(probs)))

        ref = RefCrops(crop_size=(ch, cw))
        ref.transform(torch.from_numpy(image.transpose(0, 3, 1, 2)), [[]])
        ref_out = ref.inv_transform(
            torch.from_numpy(probs.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(got[..., 0], ref_out.numpy()[:, 0],
                                   atol=1e-6)

    def test_constant_crops_average_to_constant(self, rng):
        """Count normalization: constant per-crop predictions must come
        back constant everywhere (every pixel's overlaps cancel)."""
        ours = Crops(crop_size=(32, 48))
        img = jnp.zeros((1, 70, 100, 3))
        crops, _ = ours.transform(img, [])
        out = ours.inv_transform(jnp.full(crops.shape[:3] + (1,), 0.7))
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)

    def test_small_image_passthrough(self, rng):
        ours = Crops(crop_size=(128, 128))
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        crops, clicks_lists = ours.transform(img, [Click(True, (3, 4))])
        assert crops.shape == (1, 64, 96, 3)
        assert ours._counts is None
        p = jnp.asarray(rng.rand(1, 64, 96, 1).astype(np.float32))
        assert ours.inv_transform(p) is p


class TestTiledPredictor:
    @pytest.fixture(scope="class")
    def net(self, class_rng):
        net = FBRSDeepLabModel()
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3)),
                          jnp.zeros((1, 2, 2)))
        return net, params

    def test_small_case_equals_whole_image(self, net, class_rng):
        """When the image fits one crop, tiled inference must equal
        whole-image inference exactly (single crop, flip-averaged)."""
        from mivos_tpu.interactive.fbrs_predictor import get_predictor

        model, params = net
        img = jnp.asarray(class_rng.rand(48, 64, 3).astype(np.float32))
        clicker = Clicker()
        clicker.add_click(Click(True, (24, 30)))

        tiled = TiledPredictor(model, params, crop_size=(48, 64))
        tiled.set_input_image(img)
        pt = np.asarray(tiled.get_prediction(clicker))

        base = get_predictor(model, params, "NoBRS")
        base.set_input_image(img)
        pb = np.asarray(base.get_prediction(clicker))
        np.testing.assert_allclose(pt, pb, atol=1e-5)

    def test_noc_harness_on_oversize_image(self, net, class_rng):
        """The NoC harness drives tiled inference on an image LARGER
        than the crop window (VERDICT round-1 item 4)."""
        from mivos_tpu.eval.noc import evaluate_sample

        model, params = net
        img = class_rng.rand(80, 112, 3).astype(np.float32)
        gt = np.zeros((80, 112), np.int32)
        gt[30:60, 40:90] = 1

        tiled = TiledPredictor(model, params, crop_size=(48, 64))
        clicks, ious, probs = evaluate_sample(
            img, gt, tiled, max_iou_thr=2.0, max_clicks=3)
        assert probs.shape == (80, 112)
        assert np.isfinite(np.asarray(probs)).all()
        assert len(ious) == 3 and len(clicks) == 3


class TestFlipPointTransform:
    def test_out_of_crop_click_mirrors_not_phantom(self, class_rng):
        """A click left of a crop (shifted x < 0) must mirror to
        w-1-x in the flipped half — rewriting it to x=-1 used to plant
        a phantom VALID click at the crop edge. Padding sentinels
        (both coords negative) must stay sentinels."""
        net = FBRSDeepLabModel()
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 48, 64, 3)), jnp.zeros((1, 2, 2)))
        pred = TiledPredictor(net, params, crop_size=(48, 64))
        w = 64
        pts = jnp.asarray(np.array([[[10.0, -20.0],    # real, left of crop
                                     [-1.0, -1.0]]], np.float32))
        is_click = (pts[..., 0] >= 0) | (pts[..., 1] >= 0)
        fx = jnp.where(is_click, w - 1 - pts[..., 1], pts[..., 1])
        fpts = np.asarray(pts.at[..., 1].set(fx))
        assert fpts[0, 0, 1] == w - 1 - (-20.0)       # mirrored, valid
        assert tuple(fpts[0, 1]) == (-1.0, -1.0)      # sentinel intact

    def test_prediction_unaffected_by_far_click_edge(self, class_rng):
        """End-to-end: with one in-crop positive click and one far
        out-of-crop negative click, the tiled prediction must stay
        finite and in [0, 1] (the phantom-click bug skewed the flipped
        half's distance fields)."""
        model = FBRSDeepLabModel()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 48, 64, 3)),
                            jnp.zeros((1, 2, 2)))
        img = jnp.asarray(class_rng.rand(60, 128, 3).astype(np.float32))
        clicker = Clicker()
        clicker.add_click(Click(True, (30, 100)))
        clicker.add_click(Click(False, (30, 5)))
        tiled = TiledPredictor(model, params, crop_size=(48, 64))
        tiled.set_input_image(img)
        prob = np.asarray(tiled.get_prediction(clicker))
        assert prob.shape == (60, 128)
        assert np.isfinite(prob).all() and prob.min() >= 0 <= 1
