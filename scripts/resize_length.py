"""Subsample overly long videos to a target frame count (reference:
scripts/resize_length.py): keeps evenly spaced frames, renumbering
%05d, for both JPEGImages and Annotations."""
import argparse
import os
import shutil
from os import path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--max_length", type=int, default=100)
    args = p.parse_args()

    for vid in sorted(os.listdir(args.in_root)):
        src = path.join(args.in_root, vid)
        frames = sorted(os.listdir(src))
        t = len(frames)
        if t > args.max_length:
            keep = [frames[round(i * (t - 1) / (args.max_length - 1))]
                    for i in range(args.max_length)]
        else:
            keep = frames
        dst = path.join(args.out_root, vid)
        os.makedirs(dst, exist_ok=True)
        for i, f in enumerate(keep):
            ext = path.splitext(f)[1]
            shutil.copyfile(path.join(src, f),
                            path.join(dst, f"{i:05d}{ext}"))
        print(vid, t, "->", len(keep))


if __name__ == "__main__":
    main()
