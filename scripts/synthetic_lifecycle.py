"""Full fusion-training lifecycle on synthetic data (VERDICT r2 item 6):
synthetic videos -> generate_fusion.py -> FusionDataset -> train.py on
the 8-device virtual CPU mesh, with a REAL mid-run SIGKILL + orbax
resume — proving the reference's training lifecycle
(/root/reference/train.py:66-129) end-to-end beyond unit tests.

Phases (each a subprocess with the real CLI entry points):
  1. write 12 synthetic 384x384 videos in the DAVIS disk layout
  2. generate_fusion.py --model_npz weights/prop_synthetic.npz
  3. train.py ... --iterations N, SIGKILLed after the midpoint report
  4. train.py --load_model <saves> resumes from the latest checkpoint
     and finishes

Evidence (loss curve + resume line) is written to
docs/synthetic_training_run.md.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/synthetic_lifecycle.py \
    [--root /tmp/lifecycle] [--iterations 400] [--batch 8]
"""
import argparse
import os
import re
import signal
import subprocess
import sys
import time
from os import path

import numpy as np

REPO = path.dirname(path.dirname(path.abspath(__file__)))


def cpu_env(n_devices: int = 8) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MIVOS_NO_CACHE"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # keep the axon plugin out
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    return env


def write_dataset(root: str, n_videos: int = 12, t: int = 10,
                  hw: int = 384) -> None:
    from PIL import Image

    from mivos_tpu.generation.synthetic import synthetic_sequence
    from mivos_tpu.utils.palette import save_indexed_png

    im_root = path.join(root, "trainval", "JPEGImages", "480p")
    gt_root = path.join(root, "trainval", "Annotations", "480p")
    imset = path.join(root, "trainval", "ImageSets", "2017")
    os.makedirs(imset, exist_ok=True)
    names = []
    for i in range(n_videos):
        name = f"synth{i:02d}"
        names.append(name)
        os.makedirs(path.join(im_root, name), exist_ok=True)
        os.makedirs(path.join(gt_root, name), exist_ok=True)
        images, labels = synthetic_sequence(300 + i, t, hw, hw,
                                            num_objects=2)
        for fi in range(t):
            Image.fromarray((images[fi] * 255).astype(np.uint8)).save(
                path.join(im_root, name, f"{fi:05d}.jpg"), quality=95)
            save_indexed_png(path.join(gt_root, name, f"{fi:05d}.png"),
                             labels[fi].astype(np.uint8))
    with open(path.join(imset, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"[data] wrote {n_videos} videos x {t} frames at {hw}^2",
          flush=True)


def run_train(args_list, env, kill_at_it=None, log_lines=None):
    """Run train.py, optionally SIGKILL it once iteration kill_at_it is
    reported. Returns (returncode, saw_resume)."""
    proc = subprocess.Popen([sys.executable, path.join(REPO, "train.py")]
                            + args_list, env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    saw_resume = False
    killed = False
    for line in proc.stdout:
        line = line.rstrip()
        print("  |", line, flush=True)
        if log_lines is not None and (
                " It " in line or "resumed" in line or "git" in line[:4]):
            log_lines.append(line)
        if "resumed at iteration" in line:
            saw_resume = True
        m = re.search(r"It\s+(\d+)", line)
        if kill_at_it is not None and m and int(m.group(1)) >= kill_at_it \
                and not killed:
            print(f"[lifecycle] SIGKILL at iteration {m.group(1)}",
                  flush=True)
            proc.send_signal(signal.SIGKILL)
            killed = True
    proc.wait()
    return proc.returncode, saw_resume, killed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lifecycle")
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--save-every", type=int, default=100)
    ap.add_argument("--weights", default="weights/prop_synthetic.npz")
    ap.add_argument("--skip-gen", action="store_true",
                    help="reuse an existing --root dataset + fusion maps")
    args = ap.parse_args()

    env = cpu_env()
    os.makedirs(args.root, exist_ok=True)
    fd_root = path.join(args.root, "fusion")
    if args.skip_gen and os.path.isdir(fd_root):
        print("[lifecycle] reusing existing data + fusion maps", flush=True)
    else:
        write_dataset(args.root)
        t0 = time.time()
        rc = subprocess.run(
        [sys.executable, path.join(REPO, "generate_fusion.py"),
         "--dataset", "DAVIS", "--davis_root", args.root,
         "--model_npz", args.weights, "--output",
         path.join(fd_root, "davis"), "--separation", "8",
             "--dtype", "float32"], env=env, cwd=REPO).returncode
        assert rc == 0, "generate_fusion failed"
        print(f"[generate_fusion] done in {time.time() - t0:.0f}s",
              flush=True)

    train_args = [
        "--id", "lifecycle", "--stage", "1",
        "--im_root", path.join(args.root, "trainval/JPEGImages/480p"),
        "--gt_root", path.join(args.root, "trainval/Annotations/480p"),
        "--fd_root", fd_root,
        "--batch_size", str(args.batch),
        "--iterations", str(args.iterations),
        "--save_every", str(args.save_every),
        "--report_every", "25",
        "--save_dir", path.join(args.root, "saves"),
        "--num_workers", "2",
    ]
    log = []
    kill_at = args.iterations // 2
    rc, _, killed = run_train(train_args, env, kill_at_it=kill_at,
                              log_lines=log)
    assert killed, "never reached the kill point"
    log.append(f"--- SIGKILL delivered at ~iteration {kill_at}; "
               f"train.py exited rc={rc} ---")

    rc, saw_resume, _ = run_train(
        train_args + ["--load_model",
                      path.join(args.root, "saves", "lifecycle")],
        env, log_lines=log)
    assert rc == 0, f"resumed run failed rc={rc}"
    assert saw_resume, "resume line never printed"

    losses = [float(m.group(1)) for line in log
              for m in [re.search(r"\[total_loss\s*\]:\s*([0-9.eE+-]+)",
                                  line)] if m]
    doc = path.join(REPO, "docs", "synthetic_training_run.md")
    os.makedirs(path.dirname(doc), exist_ok=True)
    with open(doc, "w") as f:
        f.write(
            "# Recorded synthetic fusion-training run (lifecycle proof)\n\n"
            "`scripts/synthetic_lifecycle.py`: synthetic 384^2 videos -> "
            "`generate_fusion.py` -> `FusionDataset` -> `train.py` on the "
            "8-device virtual CPU mesh, SIGKILLed mid-run and RESUMED "
            "from the orbax checkpoint (reference lifecycle: "
            "/root/reference/train.py:66-129).\n\n"
            f"- iterations: {args.iterations}, batch {args.batch} "
            f"(sharded over 8 virtual devices), save_every "
            f"{args.save_every}\n"
            f"- SIGKILL at ~iteration {kill_at}; resumed from latest "
            "checkpoint; run completed.\n"
            f"- total_loss trajectory: first={losses[0]:.4f} "
            f"min={min(losses):.4f} last={losses[-1]:.4f}\n\n"
            "## Console log (loss lines + resume)\n\n```\n"
            + "\n".join(log) + "\n```\n")
    print(f"[lifecycle] wrote {doc}", flush=True)
    assert losses and losses[-1] < losses[0], losses
    print("LIFECYCLE-OK")


if __name__ == "__main__":
    main()
