"""generate_fusion.py resume contract (reference generate_fusion.py's
batch pre-generation, re-designed here for bounded resumable runs).

The contract the fusion-training wrapper relies on
(scripts/train_fusion_synthetic.py): an output video dir exists iff the
video is FULLY written (staged into <name>.__tmp__, renamed into place
at completion), so --skip_done resumes exactly, a video with no usable
object still completes (as an empty dir — otherwise every resume would
re-propagate it), and a re-run WITHOUT --skip_done overwrites prior
output in place instead of crashing on the existing dir.
"""
import os
import sys
from os import path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_davis(tmp_path_factory):
    """A 2-video DAVIS-format synthetic set at 64x64, where the second
    video's annotations are all-empty (no usable object anywhere)."""
    from PIL import Image

    from mivos_tpu.generation.synthetic import synthetic_sequence
    from mivos_tpu.utils.palette import save_indexed_png

    root = str(tmp_path_factory.mktemp("gfdata"))
    t, hw = 3, 64
    im_root = path.join(root, "trainval", "JPEGImages", "480p")
    gt_root = path.join(root, "trainval", "Annotations", "480p")
    imset = path.join(root, "trainval", "ImageSets", "2017")
    os.makedirs(imset, exist_ok=True)
    names = ["vid00", "vid01"]
    for vi, name in enumerate(names):
        os.makedirs(path.join(im_root, name), exist_ok=True)
        os.makedirs(path.join(gt_root, name), exist_ok=True)
        images, labels = synthetic_sequence(42 + vi, t, hw, hw,
                                            num_objects=1)
        if vi == 1:
            labels = np.zeros_like(labels)  # no usable object
        for fi in range(t):
            Image.fromarray((images[fi] * 255).astype(np.uint8)).save(
                path.join(im_root, name, f"{fi:05d}.jpg"), quality=95)
            save_indexed_png(path.join(gt_root, name, f"{fi:05d}.png"),
                             labels[fi].astype(np.uint8))
    with open(path.join(imset, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return root


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    from mivos_tpu.checkpoint.npz import save_params_npz
    from mivos_tpu.models.propagation import PropagationNetwork

    net = PropagationNetwork()
    f0 = jnp.zeros((64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), f0,
                      jnp.zeros((1, 64, 64, 1)), f0)
    out = str(tmp_path_factory.mktemp("gfw") / "prop.npz")
    save_params_npz(out, params)
    return out


def _run_main(monkeypatch, argv):
    import importlib.util

    root = path.dirname(path.dirname(path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "generate_fusion_under_test", path.join(root, "generate_fusion.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["generate_fusion.py"] + argv)
    mod.main()


def test_resume_contract(tiny_davis, tiny_weights, tmp_path, monkeypatch,
                         capsys):
    out = str(tmp_path / "fusion")
    argv = ["--dataset", "DAVIS", "--davis_root", tiny_davis,
            "--model_npz", tiny_weights, "--output", out,
            "--separation", "2", "--dtype", "float32", "--mem_freq", "1"]

    _run_main(monkeypatch, argv)
    got = capsys.readouterr().out
    assert "ALL-DONE" in got
    # Both videos completed — including the one with no usable object
    # (empty dir), so a resume will not re-propagate it.
    assert path.isdir(path.join(out, "vid00"))
    assert path.isdir(path.join(out, "vid01"))
    assert os.listdir(path.join(out, "vid01")) == []
    pngs = []
    for dirpath, _, files in os.walk(path.join(out, "vid00")):
        pngs += [path.join(dirpath, f) for f in files if f.endswith(".png")]
    assert pngs, "vid00 produced no fusion maps"
    # No staging leftovers
    assert not [d for d in os.listdir(out) if d.endswith(".__tmp__")]

    # Re-run WITHOUT --skip_done: overwrites in place (regression: the
    # staged rename used to crash ENOTEMPTY on the existing dir).
    mtime0 = path.getmtime(pngs[0])
    _run_main(monkeypatch, argv)
    assert "ALL-DONE" in capsys.readouterr().out
    assert path.isfile(pngs[0]) and path.getmtime(pngs[0]) >= mtime0

    # --skip_done skips both completed videos without touching the net.
    _run_main(monkeypatch, argv + ["--skip_done"])
    got = capsys.readouterr().out
    assert got.count("(skipped)") == 2 and "ALL-DONE" in got
