"""In-repo DAVIS-interactive robot, J&F metrics, and hermetic session
(eval/davis_metrics.py, eval/robot.py): the self-contained stand-in for
the external davisinteractive package (reference
eval_interactive_davis.py:74-108)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.eval.davis_metrics import (batched_jf, db_eval_boundary,
                                          db_eval_iou, sequence_jf,
                                          summarize_session)
from mivos_tpu.eval.robot import (InteractiveScribblesRobot,
                                  LocalInteractiveSession,
                                  _longest_skeleton_path, zhang_suen_thin)
from mivos_tpu.interactive.scribbles import annotated_frames, scribbles2mask


def square(h, w, r0, c0, r1, c1):
    m = np.zeros((h, w), np.int32)
    m[r0:r1, c0:c1] = 1
    return m


class TestMetrics:
    def test_iou_basic(self):
        a = square(20, 20, 2, 2, 10, 10)
        assert db_eval_iou(a, a) == 1.0
        assert db_eval_iou(a, np.zeros_like(a)) == 0.0
        assert db_eval_iou(np.zeros_like(a), np.zeros_like(a)) == 1.0
        b = square(20, 20, 2, 2, 10, 18)  # half-width overlap
        assert abs(db_eval_iou(a, b) - 0.5) < 1e-6

    def test_boundary_identical_and_shifted(self):
        a = square(64, 64, 10, 10, 40, 40)
        assert db_eval_boundary(a, a) == 1.0
        # 1-px shift is inside the ~1-px match radius at 64x64
        b = square(64, 64, 11, 10, 41, 40)
        assert db_eval_boundary(a, b) == 1.0
        # 20-px shift: boundaries barely match
        c = square(64, 64, 30, 30, 60, 60)
        assert db_eval_boundary(a, c) < 0.5
        assert db_eval_boundary(a, np.zeros_like(a)) == 0.0
        assert db_eval_boundary(np.zeros_like(a), np.zeros_like(a)) == 1.0

    def test_batched_jf_and_sequence_scalar(self):
        gt = np.stack([square(32, 32, 4, 4, 16, 16),
                       square(32, 32, 8, 8, 20, 20)])
        J, F = batched_jf(gt, gt, num_objects=1)
        assert J.shape == (1, 2) and F.shape == (1, 2)
        np.testing.assert_allclose(J, 1.0)
        np.testing.assert_allclose(F, 1.0)
        assert sequence_jf(gt, gt, 1) == 1.0

    def test_summarize_session_curve(self):
        # One sequence: metric 0.5 at t=10, 0.9 at t=50.
        s = summarize_session({"seq": [(10.0, 0.5), (50.0, 0.9)]},
                              max_time=100.0, metric_at=60.0)
        assert abs(s["metric_at_60s"] - 0.9) < 1e-6
        # AUC: 0 for t<10, 0.5 for 10<=t<50, 0.9 after = (40*.5+50*.9)/100
        assert abs(s["auc"] - 0.65) < 0.02


class TestThinning:
    def test_thick_blob_thins_to_interior_skeleton(self):
        blob = square(40, 60, 10, 10, 30, 50).astype(bool)
        skel = zhang_suen_thin(blob)
        assert skel.sum() > 0
        assert (skel & ~blob).sum() == 0          # stays inside
        assert skel.sum() < 0.15 * blob.sum()     # much thinner
        path = _longest_skeleton_path(skel)
        assert len(path) >= 10

    def test_line_survives(self):
        line = np.zeros((20, 20), bool)
        line[10, 2:18] = True
        skel = zhang_suen_thin(line)
        assert skel.sum() >= 14
        path = _longest_skeleton_path(skel)
        assert len(path) >= 14


class TestRobot:
    def test_round0_scribbles_inside_gt_objects(self):
        gt = np.zeros((2, 48, 64), np.int32)
        gt[:, 8:24, 8:28] = 1
        gt[:, 30:44, 36:60] = 2
        robot = InteractiveScribblesRobot()
        scr = robot.interact(np.zeros_like(gt), gt, num_objects=2)
        idx = scr["annotated_frame"]
        assert annotated_frames(scr) == [idx]
        raster = scribbles2mask(scr, (48, 64))[idx]
        objs = set(np.unique(raster)) - {-1}
        assert {1, 2} <= objs
        for k in (1, 2):
            ys, xs = np.nonzero(raster == k)
            assert len(ys) > 0
            assert (gt[idx][ys, xs] == k).all()    # strictly inside

    def test_selects_worst_frame_and_corrects_error(self):
        gt = np.zeros((3, 48, 64), np.int32)
        gt[:, 10:30, 10:40] = 1
        pred = gt.copy()
        pred[1, 10:30, 10:40] = 0      # frame 1 entirely wrong
        robot = InteractiveScribblesRobot()
        assert robot.select_frame(pred, gt, 1) == 1
        scr = robot.interact(pred, gt, num_objects=1)
        assert scr["annotated_frame"] == 1
        raster = scribbles2mask(scr, (48, 64))[1]
        ys, xs = np.nonzero(raster == 1)
        assert len(ys) > 0 and (gt[1][ys, xs] == 1).all()

    def test_candidates_restrict_choice(self):
        gt = np.zeros((3, 32, 32), np.int32)
        gt[:, 4:20, 4:20] = 1
        pred = np.zeros_like(gt)       # every frame equally bad
        robot = InteractiveScribblesRobot()
        assert robot.select_frame(pred, gt, 1, candidates=[2]) == 2

    def test_perfect_prediction_yields_empty(self):
        gt = np.zeros((1, 32, 32), np.int32)
        gt[:, 4:20, 4:20] = 1
        robot = InteractiveScribblesRobot()
        scr = robot.interact(gt.copy(), gt, num_objects=1)
        assert annotated_frames(scr) == []


class TestLocalSession:
    def test_oracle_reaches_auc_one(self):
        gt = np.zeros((2, 32, 32), np.int32)
        gt[:, 4:20, 4:20] = 1
        sess = LocalInteractiveSession({"s": (gt, 1)},
                                       max_nb_interactions=3,
                                       max_time=1000.0)
        with sess:
            while sess.next():
                _name, _scr, _new = sess.get_scribbles()
                sess.submit_masks(gt)           # oracle
        summary = sess.get_global_summary()
        # Oracle submits instantly; step curve is ~1 from t~0.
        assert summary["auc"] > 0.99
        assert summary["metric_at_60s"] > 0.99
        assert len(sess.get_report()["s"]) == 3

    def test_get_scribbles_only_last_false_merges_history(self):
        gt = np.zeros((2, 32, 32), np.int32)
        gt[:, 4:20, 4:20] = 1
        sess = LocalInteractiveSession({"s": (gt, 1)},
                                       max_nb_interactions=2,
                                       max_time=1000.0)
        with sess:
            assert sess.next()
            _, first, _ = sess.get_scribbles()
            sess.submit_masks(np.zeros_like(gt))
            assert sess.next()
            _, merged, _ = sess.get_scribbles(only_last=False)
        n_first = sum(len(ls) for ls in first["scribbles"])
        n_merged = sum(len(ls) for ls in merged["scribbles"])
        assert n_first > 0 and n_merged > n_first   # both rounds present

    def test_blind_processor_scores_low(self):
        gt = np.zeros((2, 32, 32), np.int32)
        gt[:, 4:28, 4:28] = 1
        sess = LocalInteractiveSession({"s": (gt, 1)},
                                       max_nb_interactions=2,
                                       max_time=1000.0)
        with sess:
            while sess.next():
                sess.get_scribbles()
                sess.submit_masks(np.zeros_like(gt))
        assert sess.get_global_summary()["auc"] < 0.2


class TestEndToEnd:
    def test_full_protocol_with_tiny_nets(self):
        """The complete hermetic benchmark: robot scribbles -> S2M ->
        propagate (+update-only rounds per the [2,5,7] schedule) across
        2 sequences x 3 rounds (reference eval_interactive_davis.py)."""
        from mivos_tpu.eval.davis_interactive import run_local_interactive
        from mivos_tpu.models.propagation import PropagationNetwork
        from mivos_tpu.models.s2m import S2MNetwork

        t, h, w, k = 3, 48, 64, 2
        rng = np.random.RandomState(3)
        prop = PropagationNetwork(top_k=10)
        f0 = jnp.zeros((h, w, 3))
        pp = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((k, h, w, 1)), f0)
        s2m = S2MNetwork()
        sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((k, h, w, 6)))

        sequences = {}
        for name in ("a", "b"):
            images = rng.rand(t, h, w, 3).astype(np.float32)
            gt = np.zeros((t, h, w), np.int32)
            gt[:, 8:24, 8:28] = 1
            gt[:, 28:44, 36:60] = 2
            sequences[name] = (images, gt, k)

        summary = run_local_interactive(
            prop, pp, None, None, s2m, sp, sequences,
            max_nb_interactions=3, max_time_per_interaction=1000)
        assert 0.0 <= summary["auc"] <= 1.0
        assert len(summary["curve"]["time"]) == len(
            summary["curve"]["metric"])

    def test_on_disk_davis_layout(self, tmp_path):
        """run_local_interactive_davis: the --local_robot CLI path reads
        the standard DAVIS directory layout and lazily loads videos."""
        import os
        from os import path
        from PIL import Image

        from mivos_tpu.eval.davis_interactive import (
            run_local_interactive_davis)
        from mivos_tpu.models.propagation import PropagationNetwork
        from mivos_tpu.models.s2m import S2MNetwork
        from mivos_tpu.utils.palette import save_indexed_png

        t, h, w, k = 2, 48, 64, 2
        root = str(tmp_path)
        rng = np.random.RandomState(5)
        for sub in ("JPEGImages/480p/vid", "Annotations/480p/vid",
                    "ImageSets/2017"):
            os.makedirs(path.join(root, "trainval", sub), exist_ok=True)
        with open(path.join(root, "trainval/ImageSets/2017/val.txt"),
                  "w") as f:
            f.write("vid\n")
        lab = np.zeros((h, w), np.uint8)
        lab[8:24, 8:28] = 1
        lab[28:44, 36:60] = 2
        for fi in range(t):
            Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
                path.join(root, "trainval/JPEGImages/480p/vid",
                          f"{fi:05d}.jpg"))
            save_indexed_png(
                path.join(root, "trainval/Annotations/480p/vid",
                          f"{fi:05d}.png"), lab)

        prop = PropagationNetwork(top_k=10)
        f0 = jnp.zeros((h, w, 3))
        pp = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((k, h, w, 1)), f0)
        s2m = S2MNetwork()
        sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((k, h, w, 6)))

        summary = run_local_interactive_davis(
            prop, pp, None, None, s2m, sp, davis_root=root,
            max_nb_interactions=3, max_time_per_interaction=1000)
        assert 0.0 <= summary["auc"] <= 1.0
