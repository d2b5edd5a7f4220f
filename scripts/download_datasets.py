"""Fetch evaluation/training datasets (reference: download_datasets.py).

Requires `gdown` and network access. Respect each dataset's license:
DAVIS (davischallenge.org), YouTubeVOS (youtube-vos.org), BL30K
(see download_bl30k.py).
"""
import os
import zipfile

DAVIS = {
    "../DAVIS/DAVIS-data.zip":
        "198aRlh5CpAoFz0hfRgYbiNenn_K8DxWD",            # 2016
    "../DAVIS/2017/DAVIS-2017-trainval-480p.zip":
        "1kiaxrX_4GuW6NmiVuKGSGVoKGWjOdp6d",
    "../DAVIS/2017/DAVIS-2017-test-dev-480p.zip":
        "1fmkxU2v9cQwyb62Tj1xFDdh2p4kDsUzD",
    "../DAVIS/2017/DAVIS-2017-scribbles-trainval.zip":
        "1JzIQSu36h7dVM8q0VoE4oZJwBXvrZlkl",
}


def fetch_and_extract(gid: str, out: str) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if not os.path.exists(out):
        import gdown  # gated: only the download needs it

        gdown.download(id=gid, output=out, quiet=False)
    with zipfile.ZipFile(out) as zf:
        # Refuse path-traversal members from a compromised mirror.
        base = os.path.realpath(os.path.dirname(out))
        for name in zf.namelist():
            dest = os.path.realpath(os.path.join(base, name))
            if dest != base and not dest.startswith(base + os.sep):
                raise SystemExit(f"unsafe zip member: {name}")
        zf.extractall(os.path.dirname(out))
    os.remove(out)


def main():
    for out, gid in DAVIS.items():
        fetch_and_extract(gid, out)
    print("DAVIS ready. YouTubeVOS must be fetched from "
          "https://youtube-vos.org (registration required); then run "
          "scripts/resize_youtube.py to 480p.")


if __name__ == "__main__":
    main()
