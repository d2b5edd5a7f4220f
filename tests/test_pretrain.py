"""Synthetic data generator + pretraining loops (generation/synthetic.py,
train/pretrain.py): the weights pipeline behind the accuracy envelope."""
import numpy as np

from mivos_tpu.checkpoint.npz import (load_params_npz, save_params_npz)
from mivos_tpu.generation.synthetic import (labels_to_onehot, prop_clip,
                                            prop_example, s2m_example,
                                            synthetic_sequence)


class TestSyntheticData:
    def test_sequence_shapes_and_determinism(self):
        a_img, a_lab = synthetic_sequence(7, t=4, h=48, w=64, num_objects=2)
        b_img, b_lab = synthetic_sequence(7, t=4, h=48, w=64, num_objects=2)
        assert a_img.shape == (4, 48, 64, 3) and a_lab.shape == (4, 48, 64)
        np.testing.assert_array_equal(a_lab, b_lab)
        np.testing.assert_allclose(a_img, b_img)
        assert a_img.min() >= 0.0 and a_img.max() <= 1.0
        assert set(np.unique(a_lab)) <= {0, 1, 2}
        # every object visible in every frame (trajectories stay inside)
        for ti in range(4):
            assert (a_lab[ti] == 1).sum() > 20
            assert (a_lab[ti] == 2).sum() > 20
        # objects actually move
        assert (a_lab[0] != a_lab[3]).sum() > 50

    def test_onehot_and_prop_example(self):
        _, lab = synthetic_sequence(3, t=1, h=32, w=32, num_objects=2)
        oh = labels_to_onehot(lab[0], 2)
        assert oh.shape == (2, 32, 32, 1)
        np.testing.assert_array_equal(oh[0, ..., 0] > 0, lab[0] == 1)
        ref, rm, q, qm = prop_example(5, t_gap=3, h=32, w=48, num_objects=2)
        assert ref.shape == (32, 48, 3) and rm.shape == (2, 32, 48, 1)
        assert q.shape == (32, 48, 3) and qm.shape == (2, 32, 48, 1)

    def test_prop_clip_shapes_and_chain(self):
        imgs, gts = prop_clip(11, n_steps=3, h=32, w=48, num_objects=2)
        assert imgs.shape == (4, 32, 48, 3)
        assert gts.shape == (4, 2, 32, 48, 1)
        # deterministic per seed
        imgs2, gts2 = prop_clip(11, n_steps=3, h=32, w=48, num_objects=2)
        np.testing.assert_array_equal(gts, gts2)
        np.testing.assert_allclose(imgs, imgs2)
        # consecutive frames come from ONE sequence (objects drift, not
        # teleport): at gap<=2 successive masks must overlap
        imgs3, gts3 = prop_clip(11, n_steps=3, h=32, w=48, num_objects=2,
                                max_gap=2)
        assert imgs3.shape == (4, 32, 48, 3)
        for s in range(3):
            inter = (gts3[s, 0, ..., 0] * gts3[s + 1, 0, ..., 0]).sum()
            assert inter > 0, f"object teleported between steps {s},{s+1}"

    def test_s2m_example_channels(self):
        x, gt, lab = s2m_example(4, h=48, w=64, num_objects=2)
        assert x.shape == (2, 48, 64, 6) and gt.shape == (2, 48, 64, 1)
        for k in range(2):
            pos = x[k, ..., 4] > 0
            assert pos.sum() > 0
            # positive scribbles lie inside the object's GT
            assert (gt[k, ..., 0][pos] == 1).all()


class TestPretrainers:
    def test_prop_pretrain_descends(self):
        from mivos_tpu.train.pretrain import PropPretrainer

        tr = PropPretrainer(hw=(48, 48), num_objects=2, lr=1e-3)
        # Overfit one fixed example. Adam's fresh-net transient spikes
        # the first few steps, so require recovery below the start.
        losses = [tr.step(3)[0] for _ in range(12)]
        assert all(np.isfinite(losses))
        assert min(losses[-3:]) < losses[0]

    def test_prop_pretrain_chained_descends_and_resumes(self):
        """chain_steps>=2: the multi-step curriculum (memorize own
        predictions) must descend AND share the exact param tree with
        the single-step trainer so --resume can switch curricula."""
        from mivos_tpu.train.pretrain import PropPretrainer

        tr1 = PropPretrainer(hw=(48, 48), num_objects=2, lr=1e-3)
        tr = PropPretrainer(hw=(48, 48), num_objects=2, lr=1e-3,
                            chain_steps=2, params=tr1.params)
        losses = [tr.step(3)[0] for _ in range(12)]
        assert all(np.isfinite(losses))
        assert min(losses[-3:]) < losses[0]

    def test_prop_pretrain_mixed_curriculum(self):
        """chain_mix interleaves lengths round-robin by seed (the
        scheduled-sampling curriculum): both compiled steps drive the
        SAME params/opt state, the schedule is deterministic, and the
        mixed run descends."""
        from mivos_tpu.train.pretrain import PropPretrainer

        tr = PropPretrainer(hw=(48, 48), num_objects=2, lr=1e-3,
                            chain_mix=(1, 2))
        assert [tr.pick_chain(s) for s in range(5)] == [1, 2, 1, 2, 1]
        assert set(tr._steps) == {1, 2}
        losses = [tr.step(s)[0] for s in range(10)]
        assert all(np.isfinite(losses))
        # single-length ctor path unchanged
        tr1 = PropPretrainer(hw=(48, 48), num_objects=2, chain_steps=2)
        assert tr1.mix == (2,) and tr1.pick_chain(17) == 2

    def test_s2m_pretrain_descends_and_roundtrips(self, tmp_path):
        from mivos_tpu.train.pretrain import S2MPretrainer

        tr = S2MPretrainer(hw=(48, 48), num_objects=2, lr=1e-3)
        losses = [tr.step(3)[0] for _ in range(4)]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        path = str(tmp_path / "w.npz")
        save_params_npz(path, tr.params)
        loaded = load_params_npz(path)

        def leaves(t):
            for k, v in sorted(t.items()):
                if isinstance(v, dict):
                    yield from leaves(v)
                else:
                    yield k, v

        for (ka, va), (kb, vb) in zip(leaves(tr.params["params"]),
                                      leaves(loaded["params"])):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(va), vb)

    def test_fbrs_example_layout(self):
        from mivos_tpu.generation.synthetic import fbrs_example

        im, gt, pts = fbrs_example(7, h=48, w=64, n_points=5)
        assert im.shape == (48, 64, 3) and gt.shape == (48, 64)
        assert pts.shape == (10, 2) and pts.dtype == np.float32
        # First positive click is inside the object (distance peak).
        y, x = int(pts[0, 0]), int(pts[0, 1])
        assert gt[y, x] == 1
        # Every valid positive lies inside, every valid negative outside.
        for p in pts[:5]:
            if p[0] >= 0:
                assert gt[int(p[0]), int(p[1])] == 1
        for p in pts[5:]:
            if p[0] >= 0:
                assert gt[int(p[0]), int(p[1])] == 0
        # Deterministic per seed.
        im2, gt2, pts2 = fbrs_example(7, h=48, w=64, n_points=5)
        np.testing.assert_array_equal(pts, pts2)
        np.testing.assert_array_equal(gt, gt2)

    def test_fbrs_pretrain_descends(self):
        from mivos_tpu.train.pretrain import FBRSPretrainer

        tr = FBRSPretrainer(hw=(48, 48), lr=1e-3, n_points=4, batch=2)
        # 10 steps: the bottleneck tower's early steps bounce before
        # descending (measured [0.47, 1.98, 0.42, 0.34, 1.62, 0.80,
        # 0.28, 0.27, ...] on this exact batch).
        losses = [tr.step(3)[0] for _ in range(10)]
        assert all(np.isfinite(losses))
        assert min(losses[-3:]) < losses[0]
