"""Generate examples/example.mp4 — a synthetic GUI demo clip (the
reference ships example/example.mp4 for `interactive_gui.py --video`;
this produces a license-free equivalent from generation/synthetic.py).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_example_video.py
"""
import os

import cv2
import numpy as np

from mivos_tpu.generation.synthetic import synthetic_sequence


def main(out="examples/example.mp4", t=60, h=480, w=854):
    images, _ = synthetic_sequence(42, t, h, w, num_objects=3)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    assert vw.isOpened(), "cv2 VideoWriter failed to open"
    for fr in (images * 255).astype(np.uint8):
        vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    vw.release()
    print(f"wrote {out} ({os.path.getsize(out)} bytes, {t} frames {w}x{h})")


if __name__ == "__main__":
    main()
