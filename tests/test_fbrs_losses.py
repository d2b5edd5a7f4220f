"""f-BRS losses/metrics vs the reference torch implementation."""
import sys
from os import path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, path.dirname(__file__))
from torch_oracle import install_reference_stubs

from mivos_tpu.train.fbrs_losses import (AdaptiveIoU, compute_iou,
                                         focal_loss, normalized_focal_loss,
                                         sigmoid_bce_loss)

install_reference_stubs()


@pytest.fixture
def data(rng):
    logits = rng.randn(2, 24, 24, 1).astype(np.float32)
    label = rng.randint(0, 2, (2, 24, 24, 1)).astype(np.float32)
    label[0, :4] = -1  # ignore region
    return logits, label


class TestAgainstReference:
    def _torch_pair(self, logits, label):
        import torch

        return (torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                torch.from_numpy(label.transpose(0, 3, 1, 2)))

    def test_normalized_focal(self, data):
        from fbrs.model.losses import NormalizedFocalLossSigmoid

        logits, label = data
        ref = NormalizedFocalLossSigmoid(alpha=0.5, gamma=2)
        tp, tl = self._torch_pair(logits, label)
        want = ref(tp, tl).detach().numpy()
        got = np.asarray(normalized_focal_loss(
            jnp.asarray(logits), jnp.asarray(label), alpha=0.5, gamma=2))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_focal(self, data):
        from fbrs.model.losses import FocalLoss

        logits, label = data
        tp, tl = self._torch_pair(logits, label)
        want = FocalLoss(alpha=0.25, gamma=2)(tp, tl).detach().numpy()
        got = np.asarray(focal_loss(jnp.asarray(logits),
                                    jnp.asarray(label)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_sigmoid_bce(self, data):
        from fbrs.model.losses import SigmoidBinaryCrossEntropyLoss

        logits, label = data
        tp, tl = self._torch_pair(logits, label)
        want = SigmoidBinaryCrossEntropyLoss()(tp, tl).detach().numpy()
        got = np.asarray(sigmoid_bce_loss(jnp.asarray(logits),
                                          jnp.asarray(label)))
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestAdaptiveIoU:
    def test_tracks_threshold_and_iou(self, rng):
        gt = np.zeros((2, 16, 16), np.float32)
        gt[:, 4:12, 4:12] = 1
        logits = np.where(gt > 0, 3.0, -3.0) + rng.randn(2, 16, 16) * 0.1
        m = AdaptiveIoU()
        for _ in range(5):
            m.update(jnp.asarray(logits), jnp.asarray(gt))
        assert m.get_epoch_value() > 0.95
        assert 0.3 <= m.iou_thresh <= 0.6
        m.reset_epoch_stats()
        assert m.get_epoch_value() == 0.0

    def test_compute_iou_ignores(self):
        pred = np.zeros((1, 8, 8), bool)
        pred[0, :4] = True
        gt = np.zeros((1, 8, 8), bool)
        gt[0, :4] = True
        ignore = np.zeros((1, 8, 8), bool)
        ignore[0, 0] = True  # pred zeroed there -> union shrinks equally
        iou = compute_iou(pred, gt, ignore)
        assert iou.shape == (1,)
        assert iou[0] < 1.0  # ignored row removed from pred but not gt


class TestOracleMaskLoss:
    """OracleMaskLoss parity vs reference brs_losses.py:29-58."""

    def _ref_loss(self):
        from fbrs.inference.predictors.brs_losses import \
            OracleMaskLoss as RefOracle

        ref = RefOracle()
        ref.predictor = type("P", (), {"object_roi": None})()
        return ref

    def test_matches_reference_flip_batch(self, rng):
        import torch

        from mivos_tpu.train.fbrs_losses import OracleMaskLoss

        result = rng.rand(2, 16, 20, 1).astype(np.float32)
        # make the flipped half consistent with a flipped batch
        gt = (rng.rand(1, 16, 20, 1) > 0.5).astype(np.float32)

        ours = OracleMaskLoss()
        ours.set_gt_mask(gt)
        loss, fp, fn_ = ours(jnp.asarray(result))
        assert (fp, fn_) == (1.0, 1.0)

        ref = self._ref_loss()
        ref.set_gt_mask(torch.from_numpy(gt.transpose(0, 3, 1, 2)))
        want, wp, wn = ref(torch.from_numpy(result.transpose(0, 3, 1, 2)),
                           None, None)
        assert (wp, wn) == (1.0, 1.0)
        np.testing.assert_allclose(float(loss), float(want.mean()),
                                   rtol=1e-5)

    def test_plateau_cutoff(self, rng):
        from mivos_tpu.train.fbrs_losses import OracleMaskLoss

        ours = OracleMaskLoss()
        ours.set_gt_mask(np.ones((1, 8, 8, 1), np.float32))
        result = jnp.full((1, 8, 8, 1), 0.5)
        out = [ours(result) for _ in range(6)]
        assert out[-1] == (0.0, 0.0, 0.0)       # plateaued
        assert out[0][1:] == (1.0, 1.0)         # never click-satisfied

    def test_roi_crop_follows_predictor(self, rng):
        """With a ZoomIn ROI active, the GT is cropped + align-corners
        resized before the BCE (reference brs_losses.py:44-48)."""
        from mivos_tpu.ops.resize import bilinear_resize_align_corners
        from mivos_tpu.train.fbrs_losses import (OracleMaskLoss,
                                                 sigmoid_bce_from_probs)

        gt = rng.rand(1, 32, 32, 1).astype(np.float32)
        result = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))

        zoom = type("Z", (), {"_object_roi": (4, 19, 8, 23)})()
        pred = type("P", (), {"zoom_in": zoom})()
        ours = OracleMaskLoss()
        ours.predictor = pred
        ours.set_gt_mask(gt)
        loss, _, _ = ours(result)

        want_gt = bilinear_resize_align_corners(
            jnp.asarray(gt[:, 4:20, 8:24]), (16, 16))
        want = float(jnp.mean(sigmoid_bce_from_probs(result, want_gt)))
        np.testing.assert_allclose(float(loss), want, rtol=1e-6)

    def test_predictor_oracle_hook_improves_gt_bce(self, rng):
        """FeatureBRSPredictor.set_oracle_gt switches the on-device BRS
        to the oracle objective; the optimized prediction's BCE vs GT
        cannot exceed the unoptimized one (best-iterate L-BFGS)."""
        import jax

        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import get_predictor
        from mivos_tpu.models.fbrs import FBRSDeepLabModel

        net = FBRSDeepLabModel()
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3)),
                          jnp.zeros((1, 2, 2)))
        img = jnp.asarray(rng.rand(48, 64, 3).astype(np.float32))
        gt = np.zeros((48, 64), np.float32)
        gt[16:36, 20:50] = 1.0

        clicker = Clicker()
        clicker.add_click(Click(True, (24, 30)))
        clicker.add_click(Click(False, (4, 60)))

        base = get_predictor(net, params, "NoBRS")
        base.set_input_image(img)
        p0 = np.asarray(base.get_prediction(clicker))

        pred = get_predictor(net, params, "f-BRS-B",
                             predictor_params={"maxiter": 4})
        pred.set_input_image(img)
        pred.set_oracle_gt(gt)
        p2 = np.asarray(pred.get_prediction(clicker))

        def bce(p):
            e = 1e-12
            return float(np.mean(-(np.log(p + e) * gt
                                   + np.log(1 - p + e) * (1 - gt))))

        assert np.isfinite(p2).all()
        assert bce(p2) <= bce(p0) + 1e-5
