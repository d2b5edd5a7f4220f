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
