"""BL30K render-farm helpers (reference: generation/blender/
clean_data.py and resize_texture.py).

  collect          move COMPLETED renders (all 160 segmentation frames
                   present) from the render scratch dir to the output
                   dir and drop the matching scene YAML beside each.
  resize-textures  downscale texture images so the short side is
                   `--min_size`, then crop to a min_size square
                   (ShapeNet textures arrive at wildly mixed sizes;
                   Blender only samples the crop).

  python scripts/bl30k_render_utils.py collect IN OUT YAML_ROOT
  python scripts/bl30k_render_utils.py resize-textures IN OUT
"""
import argparse
import os
import shutil
from multiprocessing import Pool
from os import path

FRAMES_PER_SCENE = 160


def collect(input_path: str, output_path: str, yaml_path: str) -> None:
    os.makedirs(output_path, exist_ok=True)
    moved = 0
    for r in sorted(os.listdir(input_path)):
        seg = path.join(input_path, r, "segmentation")
        if not path.isdir(seg) or len(os.listdir(seg)) != FRAMES_PER_SCENE:
            continue  # still rendering; leave in place
        dst = path.join(output_path, r)
        if path.exists(dst):
            print(f"{r}: already collected")
            continue
        shutil.move(path.join(input_path, r), output_path)
        # Scene YAMLs are sharded by the 3-char scene prefix.
        shutil.copy2(path.join(yaml_path, f"yaml_{r[:3]}", f"{r}.yaml"), dst)
        moved += 1
    print(f"completed renders: {len(os.listdir(output_path))}, "
          f"newly collected: {moved}")


def _resize_one(args) -> None:
    in_dir, out_dir, min_size = args
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(in_dir):
        img = cv2.imread(path.join(in_dir, f))
        if img is None:
            continue
        h, w = img.shape[:2]
        scale = min(h, w) / min_size
        img = cv2.resize(img, (int(w / scale), int(h / scale)),
                         interpolation=cv2.INTER_AREA)
        img = img[:min_size, :min_size]
        cv2.imwrite(path.join(out_dir, path.basename(f)), img)


def resize_textures(input_dir: str, output_dir: str,
                    min_size: int = 512) -> None:
    os.makedirs(output_dir, exist_ok=True)
    jobs = [(path.join(input_dir, d), path.join(output_dir, d), min_size)
            for d in os.listdir(input_dir)]
    with Pool() as pool:
        pool.map(_resize_one, jobs)
    print(f"resized {len(jobs)} texture dirs")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("collect")
    c.add_argument("input"), c.add_argument("output"), c.add_argument("yaml")
    r = sub.add_parser("resize-textures")
    r.add_argument("input"), r.add_argument("output")
    r.add_argument("--min_size", type=int, default=512)
    args = p.parse_args()
    if args.cmd == "collect":
        collect(args.input, args.output, args.yaml)
    else:
        resize_textures(args.input, args.output, args.min_size)


if __name__ == "__main__":
    main()
