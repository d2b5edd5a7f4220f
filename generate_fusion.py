"""Pre-generate propagated probability maps for fusion training
(reference: generate_fusion.py).

  python generate_fusion.py --dataset DAVIS --davis_root ../DAVIS/2017 \
      --output ../fusion_data/davis --separation 5
"""
import argparse
import os
from os import path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="saves/propagation_model.pth")
    p.add_argument("--model_npz", default=None,
                   help="flax .npz weights (checkpoint/npz.py) instead of "
                   "a converted torch .pth — e.g. the synthetic-pretrain "
                   "artifact from scripts/pretrain_synthetic.py")
    p.add_argument("--dataset", choices=["DAVIS", "BL"], required=True)
    p.add_argument("--davis_root", default="../DAVIS/2017")
    p.add_argument("--bl_root", default="../BL30K")
    p.add_argument("--output", required=True)
    p.add_argument("--separation", type=int, default=5)
    p.add_argument("--range", type=int, default=10,
                   help="propagation range for BL (reference :30)")
    p.add_argument("--mem_freq", type=int, default=5)
    p.add_argument("--start", type=int, default=None)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--skip_done", action="store_true",
                   help="skip videos whose output dir already exists. "
                   "Safe to resume an interrupted run: videos are "
                   "written to a <name>.__tmp__ staging dir and renamed "
                   "into place only when complete, so an existing dir "
                   "is always a finished video")
    p.add_argument("--max_videos", type=int, default=0,
                   help="process at most N videos then exit 0 (bounds "
                   "per-process host memory: the axon tunnel client "
                   "retains per-dispatch literals for its execution "
                   "memoization, ~GBs/video on the per-frame path; a "
                   "wrapper loops with --skip_done until ALL-DONE is "
                   "printed). 0 = unlimited")
    args = p.parse_args()

    from mivos_tpu.checkpoint import convert_prop_net, load_torch_state_dict
    from mivos_tpu.core.fusion_generator import FusionGenerator
    from mivos_tpu.data import BLTestDataset, DAVISTestDataset
    from mivos_tpu.models.propagation import PropagationNetwork

    os.makedirs(args.output, exist_ok=True)
    if args.dataset == "DAVIS":
        dataset = DAVISTestDataset(path.join(args.davis_root, "trainval"),
                                   imset="2017/train.txt")
    else:
        dataset = BLTestDataset(args.bl_root, start=args.start, end=args.end)

    dtype = None if args.dtype == "float32" else args.dtype
    prop_net = PropagationNetwork(dtype=dtype)
    if args.model_npz:
        from mivos_tpu.checkpoint.npz import load_params_npz

        prop_params = load_params_npz(args.model_npz)
    else:
        prop_params = {"params": convert_prop_net(
            load_torch_state_dict(args.model))}

    # Sweep stale staging dirs from an interrupted run (a video dir
    # without the .__tmp__ suffix is always COMPLETE: videos render
    # into staging and are os.rename()d into place only at the end).
    import shutil

    for d in os.listdir(args.output):
        if d.endswith(".__tmp__"):
            shutil.rmtree(path.join(args.output, d))

    processed, stopped_early = 0, False
    for index in range(len(dataset)):
        if args.skip_done and path.isdir(
                path.join(args.output, dataset.videos[index])):
            print(dataset.videos[index], "(skipped)")
            continue
        if args.max_videos and processed >= args.max_videos:
            stopped_early = True
            break
        data = dataset[index]
        rgb, msk, info = data["rgb"], data["gt"], data["info"]
        total_t = rgb.shape[0]
        gen = FusionGenerator(prop_net, prop_params, rgb,
                              mem_freq=args.mem_freq)
        staging = path.join(args.output, info["name"] + ".__tmp__")
        # Even a video with no usable object must complete (empty dir):
        # the resume contract is "output dir exists iff video finished",
        # and --skip_done must not re-propagate it on every resume.
        os.makedirs(staging, exist_ok=True)

        for frame in range(0, total_t, args.separation):
            # Only objects with a sizeable mask on this frame
            # (reference generate_fusion.py:78-86).
            usable = [k for k in range(msk.shape[0])
                      if (msk[k, frame] > 0.5).sum() > 10 * 10][:5]
            if not usable:
                continue
            gen.reset(len(usable))

            if args.dataset == "DAVIS":
                left, right = 0, total_t - 1
            else:
                left = max(0, frame - args.range)
                right = min(total_t - 1, frame + args.range)

            probs = gen.interact_mask(msk[usable, frame], frame, left, right)

            this_out = path.join(staging, f"{frame:05d}")
            for ki, obj_id in enumerate(usable):
                obj_out = path.join(this_out, f"{obj_id + 1:05d}")
                os.makedirs(obj_out, exist_ok=True)
                arr = (probs[ki + 1] * 255).astype(np.uint8)
                for f in range(left, right + 1):
                    Image.fromarray(arr[f]).save(
                        path.join(obj_out, f"{f:05d}.png"))
        # Atomic completion: a video dir exists iff it is fully written.
        # A prior run's dir (re-run without --skip_done) is replaced,
        # matching the old overwrite-in-place semantics.
        final = path.join(args.output, info["name"])
        if path.isdir(final):
            shutil.rmtree(final)
        os.rename(staging, final)
        processed += 1
        print(info["name"], flush=True)
    if not stopped_early:
        print("ALL-DONE", flush=True)
    else:
        print(f"[max-videos] stopping after {processed}", flush=True)


if __name__ == "__main__":
    main()
