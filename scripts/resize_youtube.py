"""Resize YouTubeVOS to 480p short side (reference: scripts/
resize_youtube.py) with a process pool; images bicubic, masks nearest."""
import argparse
import os
from multiprocessing import Pool
from os import path

from PIL import Image

from mivos_tpu.data.transforms import pick_480p_size


def _resize_one(job):
    src, dst, is_mask = job
    img = Image.open(src)
    if is_mask:
        img = img.convert("P")
        nh, nw = pick_480p_size(img.height, img.width)
        out = img.resize((nw, nh), Image.NEAREST)
    else:
        img = img.convert("RGB")
        nh, nw = pick_480p_size(img.height, img.width)
        out = img.resize((nw, nh), Image.BICUBIC)
    os.makedirs(path.dirname(dst), exist_ok=True)
    out.save(dst)


def collect(in_root, out_root, is_mask):
    jobs = []
    for vid in sorted(os.listdir(in_root)):
        for f in sorted(os.listdir(path.join(in_root, vid))):
            jobs.append((path.join(in_root, vid, f),
                         path.join(out_root, vid, f), is_mask))
    return jobs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--mask", action="store_true")
    p.add_argument("--workers", type=int, default=16)
    args = p.parse_args()

    jobs = collect(args.in_root, args.out_root, args.mask)
    with Pool(args.workers) as pool:
        pool.map(_resize_one, jobs)
    print(f"resized {len(jobs)} files")


if __name__ == "__main__":
    main()
