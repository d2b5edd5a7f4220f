"""Emit BlenderProc scene configs for BL30K (reference:
generation/blender/generate_yaml.py).

  python scripts/generate_bl30k.py --obj_root ../ShapeNetCore.v2 \
      --texture_list textures.txt --output ../bl30k_yaml \
      --start 0 --count 100
"""
import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--obj_root", required=True,
                   help="ShapeNet root (model folders)")
    p.add_argument("--texture_list",
                   help="file with one texture name per line")
    p.add_argument("--output", required=True)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--count", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from mivos_tpu.generation import SceneConfig, SceneGenerator

    objs = sorted(os.listdir(args.obj_root))
    textures = []
    if args.texture_list:
        with open(args.texture_list) as f:
            textures = [l.strip() for l in f if l.strip()]

    gen = SceneGenerator(SceneConfig(), objs, textures,
                         obj_root=args.obj_root, seed=args.seed)
    written = gen.write(args.output, args.start, args.count)
    print(f"wrote {len(written)} scene configs to {args.output}")


if __name__ == "__main__":
    main()
