"""Curriculum A/B: does chain_steps>=2 pretraining (train/pretrain.py,
VERDICT r4 item 1) reduce exposure-bias degradation over a propagation
pass, measured as IoU-vs-GT per frame IN the training distribution
(synthetic_sequence at the pretrain resolution)?

The accuracy envelope (scripts/accuracy_envelope.py) measures fast-vs-
exact PARITY and decision margins; it has no ground-truth axis, so
"cohort fraction" conflates confidence with quality — a curriculum
whose whole point is to remove overconfidence on self-predictions can
look worse there while producing better masks. This script scores the
masks: one GT interaction on frame 0, a full forward pass, per-frame
IoU against the generator's labels, averaged over held-out seeds, for
BOTH artifacts (chain-trained weights/prop_synthetic.npz vs the
single-step snapshot weights/prop_synthetic_s1.npz) in one process so
compiles and chip contention cancel.

The exposure-bias signature is the SLOPE: every frame past the first
reads a bank dominated by the net's own predictions (the transient
self-memory of reference inference_core.py:150-176), so an
overconfident net compounds its errors and decays faster with distance
from the interacted frame.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/curriculum_ab.py \
    [--seeds 5] [--frames 24] [--hw 256 448] [--objects 2] [--smoke]
"""
import argparse
import json
import sys
import time

import jax

if "--smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from mivos_tpu.checkpoint.npz import load_params_npz
from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.generation.synthetic import synthetic_sequence
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.utils.tensor import labels_to_probs


def iou_per_frame(out: np.ndarray, gt: np.ndarray, k: int) -> np.ndarray:
    ious = np.zeros((out.shape[0], k))
    for t in range(out.shape[0]):
        for i in range(1, k + 1):
            p, g = out[t] == i, gt[t] == i
            union = (p | g).sum()
            ious[t, i - 1] = (p & g).sum() / union if union else 1.0
    return ious.mean(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 448])
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--chain-weights", default="weights/prop_synthetic.npz")
    ap.add_argument("--s1-weights", default="weights/prop_synthetic_s1.npz")
    ap.add_argument("--out", default="/tmp/curriculum_ab.json")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.seeds, args.frames, args.hw = 1, 6, [64, 96]

    T, (H, W), K = args.frames, args.hw, args.objects
    print("devices:", jax.devices(), flush=True)
    net = PropagationNetwork(top_k=50, dtype="bfloat16")
    mem = MemoryConfig(top_k=50, mem_freq=5)

    configs = {}
    for name, wpath in (("chain", args.chain_weights),
                        ("s1", args.s1_weights)):
        if args.smoke:
            import jax.numpy as jnp
            # Fixed per-config seed: str hash() is salted per process
            # (PYTHONHASHSEED), which would break run-to-run repro.
            params = net.init(jax.random.PRNGKey(
                                  {"chain": 11, "s1": 13}[name]),
                              jnp.zeros((H, W, 3)),
                              jnp.zeros((K, H, W, 1)), jnp.zeros((H, W, 3)))
        else:
            params = load_params_npz(wpath)
        configs[name] = params

    # Held-out seeds, disjoint from every pretrain seed range
    # (pretrain stages used 1000.., 2000.., 5000..; fbrs eval 777000..).
    seeds = [888000 + 13 * s for s in range(args.seeds)]
    curves = {name: [] for name in configs}
    for seed in seeds:
        images, labels = synthetic_sequence(seed, T, H, W, K)
        gt = np.asarray(labels)
        m0 = np.asarray(labels_to_probs(labels[0], K))
        for name, params in configs.items():
            core = InferenceCore(net, params, None, None,
                                 np.asarray(images), K, mem=mem)
            t0 = time.time()
            out = np.asarray(core.interact(m0, idx=0))
            curve = iou_per_frame(out, gt, K)
            curves[name].append(curve)
            print(f"seed {seed} {name:5s}: mean {curve.mean():.4f} "
                  f"last {curve[-1]:.4f} ({time.time() - t0:.1f}s)",
                  flush=True)

    report = {"frames": T, "hw": [H, W], "objects": K, "seeds": seeds}
    for name in configs:
        arr = np.stack(curves[name])          # (seeds, T)
        mean_curve = arr.mean(0)
        report[name] = {
            "iou_per_frame": [round(float(x), 4) for x in mean_curve],
            "iou_mean": round(float(arr.mean()), 4),
            "iou_first_half": round(float(mean_curve[1:T // 2].mean()), 4),
            "iou_second_half": round(float(mean_curve[T // 2:].mean()), 4),
            "iou_last": round(float(mean_curve[-1]), 4),
        }
    if not args.smoke:
        report["gain_second_half"] = round(
            report["chain"]["iou_second_half"]
            - report["s1"]["iou_second_half"], 4)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "seeds"}, indent=1))
    print("CURRICULUM-AB-OK", flush=True)


if __name__ == "__main__":
    main()
