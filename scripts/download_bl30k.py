"""Fetch BL30K segments (reference: download_bl30k.py).

BL30K ships as six ~115 GB segments (A-F) hosted per the MiVOS release;
pass the segment letters to fetch. Requires `gdown` + ~600 GB disk for
the full set.
"""
import argparse
import os
import tarfile

SEGMENTS = ["a", "b", "c", "d", "e", "f"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="../BL30K")
    p.add_argument("--segments", nargs="*", default=SEGMENTS,
                   choices=SEGMENTS)
    p.add_argument("--url_file", required=True,
                   help="file mapping segment letter -> download URL "
                        "(the hosting rotates; see the MiVOS release "
                        "page for current links)")
    args = p.parse_args()

    import urllib.request

    urls = {}
    with open(args.url_file) as f:
        for line in f:
            if line.strip():
                seg, url = line.split(None, 1)
                urls[seg.lower()] = url.strip()

    os.makedirs(args.output, exist_ok=True)
    for seg in args.segments:
        tar_path = os.path.join(args.output, f"BL30K_{seg}.tar")
        if not os.path.exists(tar_path):
            print(f"downloading segment {seg} ...")
            urllib.request.urlretrieve(urls[seg], tar_path)
        with tarfile.open(tar_path) as tf:
            # Refuse path-traversal members from a compromised mirror.
            try:
                tf.extractall(args.output, filter="data")
            except TypeError:  # Python < 3.12
                base = os.path.realpath(args.output)
                for m in tf.getmembers():
                    dest = os.path.realpath(os.path.join(base, m.name))
                    # allow '.' itself (tar -cf x ./dir archives)
                    if dest != base and not dest.startswith(base + os.sep):
                        raise SystemExit(f"unsafe tar member: {m.name}")
                tf.extractall(args.output)
        os.remove(tar_path)
    print("done")


if __name__ == "__main__":
    main()
