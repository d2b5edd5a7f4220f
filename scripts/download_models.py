"""Fetch the published MiVOS checkpoints (reference: download_model.py).

The weights are consumed through the one-time converters in
mivos_tpu.checkpoint (convert_prop_net / convert_fusion_net /
convert_s2m / convert_fbrs*). Requires `gdown` and network access.
"""
import os

MODELS = {
    # file name -> Google Drive id (reference download_model.py:6-18)
    "propagation_model.pth": "19dfbVCQbTDzkdXwdhK0NP1-bmMxWMksV",
    "fusion.pth": "1wFyK4DROfTfU-PVNQGmakjmC7_zAvHvN",
    "s2m.pth": "1Gz1nICsX_hCzC2b6CAjMGOVEIQCHPYzr",
}
FBRS_URL = ("https://github.com/saic-vul/fbrs_interactive_segmentation/"
            "releases/download/v1.0/resnet50_dh128_lvis.pth")


def main():
    try:
        import gdown
    except ImportError:
        raise SystemExit("pip install gdown to fetch checkpoints")
    os.makedirs("saves", exist_ok=True)
    for name, gid in MODELS.items():
        out = os.path.join("saves", name)
        if not os.path.exists(out):
            gdown.download(id=gid, output=out, quiet=False)
    fbrs_out = os.path.join("saves", "fbrs.pth")
    if not os.path.exists(fbrs_out):
        import urllib.request

        urllib.request.urlretrieve(FBRS_URL, fbrs_out)
    print("checkpoints in ./saves")


if __name__ == "__main__":
    main()
