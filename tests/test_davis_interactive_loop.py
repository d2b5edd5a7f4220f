"""run_davis_interactive protocol glue, driven by a stub bot.

The official davisinteractive package is not installable in the test
sandbox; a minimal stub session reproduces its interface contract
(next/get_scribbles/submit_masks/get_global_summary) so the full loop —
sequence switching, scribble rasterization via S2M, propagate-vs-update
scheduling, mask submission, mask saving — runs end to end.
"""
import os
import sys
import types
from os import path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

T, H, W, K = 5, 48, 64, 2


def _scribble(frame, obj, t=T):
    """Minimal davisinteractive scribble dict: one diagonal line."""
    return {
        "scribbles": [
            [{"path": [[0.2, 0.2], [0.7, 0.7]], "object_id": obj,
              "start_time": 0, "end_time": 1}] if f == frame else []
            for f in range(t)
        ],
        "sequence": "stub_seq",
    }


class StubSession:
    """Drives 2 sequences x 2 interactions with deterministic scribbles."""

    def __init__(self, *a, **kw):
        self.schedule = [("seq_a", 0, True), ("seq_a", 2, False),
                         ("seq_b", 1, True), ("seq_b", 3, False)]
        self.i = -1
        self.submitted = []

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def next(self):
        self.i += 1
        return self.i < len(self.schedule)

    def get_scribbles(self, only_last=True):
        seq, frame, new_seq = self.schedule[self.i]
        return seq, _scribble(frame, obj=1 + (self.i % K)), new_seq

    def submit_masks(self, masks, next_masks=None):
        # Mirror the real package's submit_masks(pred_masks,
        # next_scribble_frame_candidates=None) contract
        # (davisinteractive 1.0.x session.session): masks must cover the
        # full sequence with integer object labels, and the optional
        # candidate list must hold in-range frame indices.
        assert masks.shape == (T, H, W), masks.shape
        assert masks.dtype == np.uint8
        assert masks.max() <= K and masks.min() >= 0
        if next_masks is not None:
            assert all(isinstance(f, (int, np.integer)) and 0 <= f < T
                       for f in next_masks), next_masks
        self.submitted.append(masks.copy())

    def get_global_summary(self, save_file=None):
        if save_file:
            with open(save_file, "w") as f:
                f.write("{}")
        return {"auc": 0.0, "num_interactions": len(self.submitted)}


@pytest.fixture
def nets(rng):
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.models.s2m import S2MNetwork

    prop = PropagationNetwork(top_k=10)
    f0 = jnp.zeros((H, W, 3))
    pp = prop.init(jax.random.PRNGKey(0), f0, jnp.zeros((K, H, W, 1)), f0)
    fuse = FusionNet()
    fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((K, H, W, 3)),
                   jnp.zeros((K, H, W, 1)), jnp.zeros((K, H, W, 1)),
                   jnp.zeros((K, H, W, 2)), jnp.zeros((K, 2)))
    s2m = S2MNetwork()
    sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((K, H, W, 6)))
    return prop, pp, fuse, fp, s2m, sp


def test_full_session_loop(tmp_path, rng, nets, monkeypatch):
    # Install the stub package before importing the eval module's target.
    pkg = types.ModuleType("davisinteractive")
    sess_pkg = types.ModuleType("davisinteractive.session")
    sess_mod = types.ModuleType("davisinteractive.session.session")
    sess_mod.DavisInteractiveSession = StubSession
    sess_pkg.session = sess_mod
    pkg.session = sess_pkg
    monkeypatch.setitem(sys.modules, "davisinteractive", pkg)
    monkeypatch.setitem(sys.modules, "davisinteractive.session", sess_pkg)
    monkeypatch.setitem(sys.modules, "davisinteractive.session.session",
                        sess_mod)
    # scribbles2mask imports the official rasterizer if available; the
    # in-repo fallback must kick in.
    from mivos_tpu.eval.davis_interactive import run_davis_interactive

    # Fake DAVIS layout for the dataset loader.
    from test_data import _save_p  # reuse fixture writer
    from PIL import Image

    root = tmp_path / "davis" / "trainval"
    for split in ["JPEGImages/480p", "Annotations/480p"]:
        for v in ["seq_a", "seq_b"]:
            os.makedirs(root / split / v)
    os.makedirs(root / "ImageSets/2017")
    (root / "ImageSets/2017/val.txt").write_text("seq_a\nseq_b\n")
    for v in ["seq_a", "seq_b"]:
        for f in range(T):
            Image.fromarray(
                (rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
                root / "JPEGImages/480p" / v / f"{f:05d}.jpg")
            lab = np.zeros((H, W), np.uint8)
            lab[10:30, 10:30] = 1
            lab[32:44, 40:60] = 2
            _save_p(lab, str(root / "Annotations/480p" / v
                             / f"{f:05d}.png"))

    prop, pp, fuse, fp, s2m, sp = nets
    from mivos_tpu.config import MemoryConfig

    summary = run_davis_interactive(
        prop, pp, fuse, fp, s2m, sp,
        davis_root=str(tmp_path / "davis"),
        out_path=str(tmp_path / "out"),
        save_mask=True,
        mem=MemoryConfig(top_k=10))
    assert summary["num_interactions"] == 4
    assert path.exists(tmp_path / "out" / "summary.json")
    # save_mask persisted at least the final sequence's masks
    saved = list((tmp_path / "out").rglob("*.png"))
    assert len(saved) >= T
