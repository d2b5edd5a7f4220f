"""NoC accuracy trajectory through the FULL f-BRS predictor stack
(VERDICT r4 item 4): Clicker -> ZoomIn -> cached head input -> on-device
L-BFGS f-BRS-B -> flip averaging -> NoC@85/90.

The reference's replayable click harness (fbrs/inference/
evaluation.py:16-56 + the NoC metric, utils.py:113-130) is the closest
thing it has to an integration test; this runs ours end-to-end with a
synthetically-pretrained click model (train/pretrain.FBRSPretrainer) on
a held-out synthetic eval set — deterministic clicker + frozen weights
=> an exactly replayable IoU trajectory.

Usage (real TPU or CPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/noc_synthetic.py \
      [--train-steps 600] [--eval-n 20] [--hw 192] \
      [--weights weights/fbrs_synthetic.npz]  # reuse/skip training
  --smoke: tiny CPU wiring check.
"""
import argparse
import json
import os
import sys
import time

from os import path

REPO = path.dirname(path.dirname(path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--eval-n", type=int, default=20)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--weights", default="weights/fbrs_synthetic.npz")
    ap.add_argument("--brs-mode", default="f-BRS-B")
    ap.add_argument("--max-clicks", type=int, default=20)
    ap.add_argument("--out", default="/tmp/noc_synthetic.json")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.train_steps, args.eval_n, args.hw = 2, 2, 64
        args.max_clicks = 3

    import numpy as np

    from mivos_tpu.checkpoint.npz import load_params_npz, save_params_npz
    from mivos_tpu.data.transforms import im_normalize
    from mivos_tpu.generation.synthetic import synthetic_sequence
    from mivos_tpu.eval.noc import compute_noc_metric, evaluate_dataset
    from mivos_tpu.interactive.fbrs_predictor import get_predictor
    from mivos_tpu.models.fbrs import FBRSDeepLabModel
    from mivos_tpu.train.pretrain import FBRSPretrainer

    print("devices:", jax.devices(), flush=True)
    hw = (args.hw, args.hw)
    # resnet50: the bottleneck tower trains through frozen BN;
    # the basic-block resnet34 diverges (FBRSPretrainer docstring).
    net = FBRSDeepLabModel(arch="resnet50", ch=128)

    if os.path.exists(args.weights):
        print(f"[fbrs] loading {args.weights}", flush=True)
        params = load_params_npz(args.weights)
    else:
        trainer = FBRSPretrainer(net=net, hw=hw, lr=args.lr)
        t0 = time.time()
        first = last = None
        for i in range(args.train_steps):
            loss, iou = trainer.step(2000 + i)
            first = first if first is not None else loss
            last = (loss, iou)
            if i % 25 == 0 or i == args.train_steps - 1:
                print(f"[fbrs] step {i:5d} loss {loss:.4f} iou "
                      f"{iou:.3f} ({time.time() - t0:.0f}s)", flush=True)
        params = trainer.params
        os.makedirs(path.dirname(args.weights) or ".", exist_ok=True)
        save_params_npz(args.weights, params)
        print(f"[fbrs] saved {args.weights} (loss {first:.4f} -> "
              f"{last[0]:.4f}, iou {last[1]:.3f})", flush=True)

    # Held-out eval set: single-object scenes from a disjoint seed range.
    class EvalSet:
        def __len__(self):
            return args.eval_n

        def __getitem__(self, i):
            imgs, labels = synthetic_sequence(
                777000 + i, 1, *hw, num_objects=1,
                min_radius=0.12, max_radius=0.30)
            return (im_normalize(imgs[0]),
                    (labels[0] == 1).astype(np.int32))

    # The PRODUCTION predictor stack (interactive/fbrs_controller.py
    # config: ZoomIn target 480 / expand 1.4, net_clicks_limit 8,
    # maxiter 20 — reference interact/fbrs_controller.py:18-29), scaled
    # ZoomIn target to the eval resolution.
    predictor = get_predictor(
        net, params, args.brs_mode,
        zoom_in_params={"target_size": max(hw), "expansion_ratio": 1.4},
        predictor_params={"net_clicks_limit": 8,
                          "maxiter": args.max_clicks if args.smoke
                          else 20})

    t0 = time.time()
    all_ious, wall = evaluate_dataset(EvalSet(), predictor,
                                      max_iou_thr=0.95,
                                      max_clicks=args.max_clicks)
    thrs = (0.80, 0.85, 0.90)
    noc, over = compute_noc_metric(all_ious, thrs,
                                   max_clicks=args.max_clicks)
    final_ious = [float(a[-1]) for a in all_ious]
    first_ious = [float(a[0]) for a in all_ious]
    report = {
        "samples": args.eval_n,
        "hw": list(hw),
        "brs_mode": args.brs_mode,
        "max_clicks": args.max_clicks,
        "noc": {f"@{t:.2f}": round(v, 2) for t, v in zip(thrs, noc)},
        "over_max": {f"@{t:.2f}": o for t, o in zip(thrs, over)},
        "iou_click1_mean": round(float(np.mean(first_ious)), 4),
        "iou_final_mean": round(float(np.mean(final_ious)), 4),
        "eval_wall_s": round(wall, 1),
        "trajectories": [[round(float(x), 4) for x in a]
                         for a in all_ious],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "trajectories"}, indent=1))
    if not args.smoke:
        # The trained model must actually climb with clicks.
        assert report["iou_final_mean"] > report["iou_click1_mean"] - 1e-6
        assert report["iou_final_mean"] >= 0.80, report["iou_final_mean"]
    print("NOC-SYNTHETIC-OK", flush=True)


if __name__ == "__main__":
    main()
