"""Adapter-contract tests (VERDICT r4 item 8): the exact
`davisinteractive` API surface run_davis_interactive assumes is frozen
in eval/davis_contract.py; every stand-in the suite drives the adapter
with (the StubSession, the hermetic LocalInteractiveSession, the
robot's scribble payloads) must satisfy it — so the stubs cannot drift
from what the real package will demand. If the official package is
installed, the same checks run against it directly."""
import numpy as np
import pytest

from mivos_tpu.eval.davis_contract import (
    check_get_scribbles_result,
    check_scribbles,
    check_session_ctor,
    check_session_methods,
    check_summary,
)

T, H, W, K = 5, 48, 64, 2


class TestStubSession:
    """The hand-rolled stub test_davis_interactive_loop drives the real
    adapter with must itself conform."""

    def test_methods_and_ctor(self):
        from test_davis_interactive_loop import StubSession

        assert check_session_methods(StubSession) == []
        assert check_session_ctor(StubSession) == []

    def test_driven_protocol(self, tmp_path):
        from test_davis_interactive_loop import StubSession

        with StubSession(davis_root="x", report_save_dir="y",
                         max_nb_interactions=8, max_time=240) as sess:
            rounds = 0
            while sess.next():
                triple = sess.get_scribbles(only_last=True)
                assert check_get_scribbles_result(triple) == []
                assert check_scribbles(triple[1], num_frames=T,
                                       num_objects=K) == []
                sess.submit_masks(np.zeros((T, H, W), np.uint8), [0])
                rounds += 1
            assert rounds > 0
        f = tmp_path / "summary.json"
        summary = sess.get_global_summary(save_file=str(f))
        assert check_summary(summary) == []
        assert f.exists()


class TestLocalSession:
    """The hermetic robot session mirrors the same surface (it replaces
    the package in run_local_interactive)."""

    def _session(self):
        from mivos_tpu.eval.robot import LocalInteractiveSession

        gt = np.zeros((T, H, W), np.int32)
        gt[:, 8:24, 8:28] = 1
        gt[:, 28:44, 36:60] = 2
        return LocalInteractiveSession({"seq": (gt, K)},
                                       max_nb_interactions=2)

    def test_methods(self):
        from mivos_tpu.eval.robot import LocalInteractiveSession

        assert check_session_methods(LocalInteractiveSession) == []

    def test_driven_protocol(self, tmp_path):
        sess = self._session()
        with sess:
            rounds = 0
            while sess.next():
                triple = sess.get_scribbles(only_last=True)
                assert check_get_scribbles_result(triple) == []
                assert check_scribbles(triple[1], num_frames=T,
                                       num_objects=K) == []
                # Imperfect prediction so the robot keeps scribbling.
                sess.submit_masks(np.zeros((T, H, W), np.uint8))
                rounds += 1
            assert rounds == 2
        f = tmp_path / "summary.json"
        assert check_summary(sess.get_global_summary(str(f))) == []
        assert f.exists()

    def test_only_last_false_merges_rounds(self):
        sess = self._session()
        with sess:
            assert sess.next()
            sess.get_scribbles(only_last=True)
            sess.submit_masks(np.zeros((T, H, W), np.uint8))
            assert sess.next()
            _, merged, _ = sess.get_scribbles(only_last=False)
            assert check_scribbles(merged, num_frames=T,
                                   num_objects=K) == []
            n_lines = sum(len(ls) for ls in merged["scribbles"])
            assert n_lines >= 2  # both rounds' lines present


class TestScribbleProducers:
    def test_robot_payload(self):
        from mivos_tpu.eval.robot import InteractiveScribblesRobot

        gt = np.zeros((T, H, W), np.int32)
        gt[:, 8:24, 8:28] = 1
        gt[:, 28:44, 36:60] = 2
        robot = InteractiveScribblesRobot()
        scr = robot.interact(np.zeros_like(gt), gt, K, sequence="s")
        assert check_scribbles(scr, num_frames=T, num_objects=K) == []

    def test_mask_to_scribble_payload(self):
        from mivos_tpu.interactive.scribbles import mask_to_scribble

        mask = np.zeros((H, W), np.uint8)
        mask[8:24, 8:28] = 1
        scr = mask_to_scribble(mask, frame=2, num_frames=T)
        assert check_scribbles(scr, num_frames=T) == []

    def test_contract_catches_drift(self):
        """The checkers actually reject malformed payloads/APIs — a
        contract that passes everything pins nothing."""
        assert check_scribbles({"nope": []}) != []
        assert check_scribbles({"scribbles": [[{"object_id": 1,
                                                "path": [[2.0, 0.5]]}]]},
                               ) != []  # point outside [0,1]^2
        assert check_scribbles({"scribbles": [[{"path": [[0.1, 0.2]]}]]},
                               ) != []  # missing object_id

        class BadSession:
            def next(self):
                return False

        assert check_session_methods(BadSession) != []
        assert check_summary({"num_interactions": 3}) != []


class TestOfficialPackage:
    def test_real_package_conforms(self):
        """Runs only where the official package exists — the schema
        these tests otherwise pin via stubs."""
        davisinteractive = pytest.importorskip("davisinteractive")
        from davisinteractive.session.session import (
            DavisInteractiveSession,
        )

        assert check_session_methods(DavisInteractiveSession) == []
        assert check_session_ctor(DavisInteractiveSession) == []
