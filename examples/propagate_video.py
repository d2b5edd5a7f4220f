"""Quickstart: propagate a first-frame mask through a video on TPU.

  python examples/propagate_video.py --video clip.mp4 \
      --mask first_frame.png --prop_model saves/propagation_model.pth \
      --fusion_model saves/fusion.pth --output out_masks

Without checkpoints it runs with random weights (pipeline smoke test).
"""
import argparse
import os
import sys
from os import path

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", help="video file (or use --images)")
    p.add_argument("--images", help="folder of frames")
    p.add_argument("--mask", required=True,
                   help="palettized PNG mask for --frame")
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--prop_model")
    p.add_argument("--fusion_model")
    p.add_argument("--output", default="out_masks")
    p.add_argument("--resolution", type=int, default=480)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.core.inference import InferenceCore
    from mivos_tpu.data.transforms import im_normalize
    from mivos_tpu.interactive.video_io import load_images, load_video
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.utils.palette import save_indexed_png

    frames = (load_video(args.video, args.resolution) if args.video
              else load_images(args.images, args.resolution))
    images = im_normalize(frames.astype(np.float32) / 255.0)
    t, h, w = images.shape[:3]

    lab = np.asarray(Image.open(args.mask).convert("P"), np.uint8)
    if lab.shape != (h, w):
        lab = np.asarray(Image.fromarray(lab, "P").resize((w, h),
                                                          Image.NEAREST))
    k = int(lab.max())
    mask = np.stack([(lab == i) for i in range(k + 1)]
                    ).astype(np.float32)[..., None]

    dtype = None if args.dtype == "float32" else args.dtype
    prop = PropagationNetwork(top_k=50, dtype=dtype)
    fuse = FusionNet(dtype=dtype)
    if args.prop_model:
        from mivos_tpu.checkpoint import (convert_fusion_net,
                                          convert_prop_net,
                                          load_torch_state_dict)

        pp = convert_prop_net(load_torch_state_dict(args.prop_model))
        fp = convert_fusion_net(load_torch_state_dict(args.fusion_model))
    else:
        print("no checkpoint given: random weights (smoke test)")
        f0 = jnp.zeros((h, w, 3))
        pp = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((k, h, w, 1)), f0)
        fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((k, h, w, 3)),
                       jnp.zeros((k, h, w, 1)), jnp.zeros((k, h, w, 1)),
                       jnp.zeros((k, h, w, 2)), jnp.zeros((k, 2)))

    core = InferenceCore(prop, pp, fuse, fp,
                         jax.device_put(images), k,
                         mem=MemoryConfig())
    masks = core.interact(mask, args.frame)

    os.makedirs(args.output, exist_ok=True)
    for ti in range(t):
        save_indexed_png(path.join(args.output, f"{ti:05d}.png"),
                         masks[ti])
    print(f"wrote {t} masks to {args.output}")


if __name__ == "__main__":
    main()
