"""Train the FusionNet to usefulness on synthetic propagation outputs
(VERDICT r3 item 2) and export it for the proxy chain.

Round 3 proved the LIFECYCLE (generate_fusion -> FusionDataset ->
train.py, kill+resume) but every accuracy-proxy run kept a random
FusionNet — half the session pixels sat below the decision margin the
envelope can speak to. This script produces a TRAINED artifact with the
same real CLI entry points, on the REAL chip:

  1. synthetic 384^2 videos in the DAVIS disk layout
     (scripts/synthetic_lifecycle.py::write_dataset)
  2. generate_fusion.py --model_npz weights/prop_synthetic.npz
     (propagated probability maps from the PRETRAINED propagation net)
  3. train.py --stage 1 --load_prop_npz weights/prop_synthetic.npz
     (frozen attention reader shares the trained propagation towers,
     reference fusion_model.py:185-188)
  4. export the final orbax checkpoint -> weights/fusion_synthetic.npz
     (checkpoint/npz.py flat tree, ready for InferenceCore /
     accuracy_envelope --fusion-weights / full_protocol_tpu)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_fusion_synthetic.py \
    [--root /tmp/fusion_syn] [--iterations 2000] [--batch 12]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time
from os import path

REPO = path.dirname(path.dirname(path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fusion_syn")
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--separation", type=int, default=4)
    ap.add_argument("--weights", default="weights/prop_synthetic.npz")
    ap.add_argument("--out", default="weights/fusion_synthetic.npz")
    ap.add_argument("--skip-gen", action="store_true",
                    help="reuse an existing --root dataset + fusion maps")
    ap.add_argument("--num-workers", type=int, default=2)
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"

    fd_root = path.join(args.root, "fusion")
    if args.skip_gen and path.isdir(fd_root):
        print("[fusion-syn] reusing dataset + fusion maps", flush=True)
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "synthetic_lifecycle",
            path.join(REPO, "scripts", "synthetic_lifecycle.py"))
        lifecycle = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(lifecycle)
        write_dataset = lifecycle.write_dataset

        os.makedirs(args.root, exist_ok=True)
        write_dataset(args.root, n_videos=args.videos, t=args.frames)
        t0 = time.time()
        # One process per <=4 videos: the axon tunnel client's
        # execution-memoization retains per-dispatch literals host-side
        # (~GBs/video on the per-frame path; an unbounded single
        # process was OOM-killed at 130 GB RSS after 17 videos).
        # generate_fusion's staged+atomic-rename writes make
        # --skip_done resume exact.
        while True:
            # Stream per-video progress live (a chunk runs for tens of
            # minutes through the tunnel; buffered output would make a
            # wedged tunnel indistinguishable from a slow run).
            p = subprocess.Popen(
                [sys.executable, path.join(REPO, "generate_fusion.py"),
                 "--dataset", "DAVIS", "--davis_root", args.root,
                 "--model_npz", args.weights,
                 "--output", path.join(fd_root, "davis"),
                 "--separation", str(args.separation),
                 "--dtype", "float32", "--skip_done",
                 "--max_videos", "4"],
                env=env, cwd=REPO, stdout=subprocess.PIPE, text=True)
            out_lines = []
            for line in p.stdout:
                sys.stdout.write(line)
                sys.stdout.flush()
                out_lines.append(line)
            p.wait()
            assert p.returncode == 0, "generate_fusion failed"
            if any("ALL-DONE" in ln for ln in out_lines):
                break
        print(f"[generate_fusion] {time.time() - t0:.0f}s", flush=True)

    save_dir = path.join(args.root, "saves")
    train_args = [
        sys.executable, path.join(REPO, "train.py"),
        "--id", "fusion_syn", "--stage", "1",
        "--im_root", path.join(args.root, "trainval/JPEGImages/480p"),
        "--gt_root", path.join(args.root, "trainval/Annotations/480p"),
        "--fd_root", fd_root,
        "--batch_size", str(args.batch),
        "--iterations", str(args.iterations),
        "--save_every", str(max(args.iterations // 4, 100)),
        "--report_every", "50",
        "--save_dir", save_dir,
        "--load_prop_npz", args.weights,
        "--num_workers", str(args.num_workers),
    ]
    t0 = time.time()
    proc = subprocess.Popen(train_args, env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    losses, log = [], []
    for line in proc.stdout:
        line = line.rstrip()
        print("  |", line, flush=True)
        m = re.search(r"\[total_loss\s*\]:\s*([0-9.eE+-]+)", line)
        if m:
            losses.append(float(m.group(1)))
            log.append(line)
    proc.wait()
    assert proc.returncode == 0, f"train.py rc={proc.returncode}"
    wall = time.time() - t0
    assert losses, "no [total_loss] lines parsed from train.py output"
    print(f"[train] {wall:.0f}s, loss first={losses[0]:.4f} "
          f"min={min(losses):.4f} last={losses[-1]:.4f}", flush=True)
    assert losses[-1] < losses[0], losses

    # Export the final checkpoint as a flat npz for inference loaders.
    from mivos_tpu.checkpoint.manager import CheckpointManager
    from mivos_tpu.checkpoint.npz import save_params_npz

    state = CheckpointManager(path.join(save_dir, "fusion_syn")).restore()
    save_params_npz(args.out, state["params"])
    print(f"[export] it={state['it']} -> {args.out}", flush=True)

    with open(path.join(args.root, "fusion_train_log.json"), "w") as f:
        json.dump({"iterations": args.iterations, "batch": args.batch,
                   "wall_s": wall, "losses": losses, "log": log}, f,
                  indent=1)
    print("FUSION-TRAIN-OK")


if __name__ == "__main__":
    main()
