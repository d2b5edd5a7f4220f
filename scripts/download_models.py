"""Fetch the published MiVOS checkpoints (reference: download_model.py).

The weights are consumed through the one-time converters in
mivos_tpu.checkpoint (convert_prop_net / convert_fusion_net /
convert_s2m / convert_fbrs*). Requires `gdown` and network access.

Optional integrity check: put known-good digests in
saves/checksums.sha256 ("<hex>  <filename>" lines, sha256sum format) and
every downloaded file is verified against it.
"""
import hashlib
import os

MODELS = {
    # file name -> Google Drive id, verbatim from the reference
    # download_model.py:8-15.
    "propagation_model.pth": "19dfbVDndFkboGLHESi8DGtuxF1B21Nm8",
    "fusion.pth": "1Lc1lI5-ix4WsCRdipACXgvS3G-o0lMoz",
    "s2m.pth": "1HKwklVey3P2jmmdmrACFlkXtcvNxbKMM",
}
FBRS_URL = ("https://github.com/saic-vul/fbrs_interactive_segmentation/"
            "releases/download/v1.0/resnet50_dh128_lvis.pth")
CHECKSUM_FILE = os.path.join("saves", "checksums.sha256")


def _load_checksums():
    sums = {}
    if os.path.exists(CHECKSUM_FILE):
        with open(CHECKSUM_FILE) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    sums[parts[1].lstrip("*")] = parts[0].lower()
    return sums


def _verify(path, sums):
    name = os.path.basename(path)
    if name not in sums:
        return
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    if h.hexdigest().lower() != sums[name]:
        os.rename(path, path + ".corrupt")
        raise SystemExit(
            f"sha256 mismatch for {name}: got {h.hexdigest()}, "
            f"expected {sums[name]} — moved to {name}.corrupt")
    print(f"verified {name}")


def main():
    try:
        import gdown
    except ImportError:
        raise SystemExit("pip install gdown to fetch checkpoints")
    os.makedirs("saves", exist_ok=True)
    sums = _load_checksums()
    for name, gid in MODELS.items():
        out = os.path.join("saves", name)
        if not os.path.exists(out):
            gdown.download(id=gid, output=out, quiet=False)
        _verify(out, sums)
    fbrs_out = os.path.join("saves", "fbrs.pth")
    if not os.path.exists(fbrs_out):
        import urllib.request

        urllib.request.urlretrieve(FBRS_URL, fbrs_out)
    _verify(fbrs_out, sums)
    print("checkpoints in ./saves")


if __name__ == "__main__":
    main()
