"""Pretrain propagation / S2M nets on synthetic moving-blob video
(VERDICT r2 item 2: peaked, trained-like weights for the accuracy
envelope and the on-TPU full-protocol run — no external data needed).

Usage (real TPU or CPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pretrain_synthetic.py \
      --net both --steps 600 --hw 192 --out weights/

Artifacts: <out>/prop_synthetic.npz, <out>/s2m_synthetic.npz (flattened
flax trees, checkpoint/npz.py) + <out>/pretrain_log.json loss curves.
"""
import argparse
import json
import os
import time


def run(kind: str, steps: int, hw: int, lr: float, k: int, out: str,
        log_every: int, seed0: int, resume: bool = False,
        chain=(1,)) -> dict:
    from mivos_tpu.checkpoint.npz import load_params_npz, save_params_npz
    from mivos_tpu.train.pretrain import (FBRSPretrainer, PropPretrainer,
                                          S2MPretrainer)

    cls = {"prop": PropPretrainer, "s2m": S2MPretrainer,
           "fbrs": FBRSPretrainer}[kind]
    init = None
    ckpt = os.path.join(out, f"{kind}_synthetic.npz")
    if resume and os.path.exists(ckpt):
        init = load_params_npz(ckpt)
        print(f"[{kind}] resuming from {ckpt}", flush=True)
    kw = {}
    if kind == "prop":
        kw = ({"chain_steps": chain[0]} if len(chain) == 1
              else {"chain_mix": tuple(chain)})
    trainer = cls(params=init, lr=lr, hw=tuple(hw), num_objects=k, **kw)
    hist = {"loss": [], "iou": [], "step": []}
    t0 = time.time()
    for i in range(steps):
        loss, iou = trainer.step(seed0 + i)
        if i % log_every == 0 or i == steps - 1:
            hist["loss"].append(loss)
            hist["iou"].append(iou)
            hist["step"].append(i)
            print(f"[{kind}] step {i:5d} loss {loss:.4f} iou {iou:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    path = os.path.join(out, f"{kind}_synthetic.npz")
    save_params_npz(path, trainer.params)
    print(f"[{kind}] saved {path}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=("prop", "s2m", "fbrs", "both"),
                    default="both")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--hw", type=int, nargs="+", default=[192],
                help="square size, or H W")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--out", default="weights")
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument("--resume", action="store_true",
                    help="continue from <out>/<net>_synthetic.npz")
    ap.add_argument("--chain", type=int, nargs="+", default=[1],
                    help="prop only: chained propagation steps per "
                    "sample (memorize own predictions; >=2 trains "
                    "against exposure bias). Multiple values "
                    "(e.g. --chain 1 3) interleave lengths round-robin "
                    "— the scheduled-sampling mixed curriculum")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    kinds = ("prop", "s2m") if args.net == "both" else (args.net,)
    logs = {}
    for kind in kinds:
        hw = args.hw * 2 if len(args.hw) == 1 else args.hw
        logs[kind] = run(kind, args.steps, hw, args.lr, args.objects,
                         args.out, args.log_every, args.seed,
                         resume=args.resume, chain=args.chain)
    # The log is merged per-net so training one net never clobbers a
    # sibling's history (an s2m run used to erase the prop curriculum
    # curves), and each run's schedule (steps/hw/lr/seed/chain) is
    # appended so the curriculum a checkpoint went through is auditable.
    log_path = os.path.join(args.out, "pretrain_log.json")
    old = {}
    if os.path.exists(log_path):
        with open(log_path) as f:
            old = json.load(f)
    for kind, hist in logs.items():
        meta = {"steps": args.steps, "hw": hw, "lr": args.lr,
                "seed": args.seed, "resume": args.resume}
        if kind == "prop":
            meta["chain"] = args.chain
        if args.resume and kind in old:  # append continued curves
            base = old[kind]["step"][-1] + 1
            merged = {k2: old[kind][k2] + (
                [s + base for s in hist["step"]] if k2 == "step"
                else hist[k2]) for k2 in ("loss", "iou", "step")}
            merged["schedule"] = old[kind].get("schedule", []) + [meta]
            old[kind] = merged
        else:
            old[kind] = dict(hist, schedule=[meta])
    with open(log_path, "w") as f:
        json.dump(old, f, indent=1)
    print("PRETRAIN-OK")


if __name__ == "__main__":
    main()
