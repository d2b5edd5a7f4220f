"""Quickstart: interactive click segmentation (f-BRS) on one image.

  python examples/click_to_mask.py --image photo.jpg \
      --fbrs_model saves/fbrs.pth \
      --clicks "120,340,+ 80,500,-" --output mask.png

Click syntax: "y,x,+" = positive (object), "y,x,-" = negative
(background), space-separated. Modes: NoBRS, f-BRS-A/B/C, RGB-BRS,
DistMap-BRS (reference fbrs/inference/predictors/__init__.py).
Without a checkpoint it runs with random weights (pipeline smoke test).
"""
import argparse
import sys
from os import path

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def parse_clicks(spec):
    clicks = []
    for tok in spec.split():
        try:
            y, x, sign = tok.split(",")
            assert sign in ("+", "-")
        except (ValueError, AssertionError):
            raise SystemExit(f'bad click "{tok}" — expected "y,x,+" or '
                             f'"y,x,-" (e.g. "120,340,+ 80,500,-")')
        clicks.append((float(y), float(x), sign == "+"))
    if not clicks:
        raise SystemExit("no clicks given — pass at least one "
                         '"y,x,+" token in --clicks')
    return clicks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--fbrs_model")
    p.add_argument("--clicks", required=True,
                   help='e.g. "120,340,+ 80,500,-"')
    p.add_argument("--brs_mode", default="f-BRS-B")
    p.add_argument("--output", default="mask.png")
    p.add_argument("--zoom_target", type=int, default=480)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mivos_tpu.data.transforms import im_normalize
    from mivos_tpu.interactive.clicker import Click, Clicker
    from mivos_tpu.interactive.fbrs_predictor import get_predictor
    from mivos_tpu.utils.palette import save_indexed_png

    try:
        import cv2
        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    except Exception:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB"))
    norm = im_normalize(img.astype(np.float32) / 255.0)

    if args.fbrs_model:
        from mivos_tpu.checkpoint import load_torch_state_dict
        from mivos_tpu.models import build_fbrs_from_state_dict
        net, params = build_fbrs_from_state_dict(
            load_torch_state_dict(args.fbrs_model))
    else:
        from mivos_tpu.models.fbrs import FBRSDeepLabModel
        net = FBRSDeepLabModel()
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 2, 2)))
        print("warning: random weights (no --fbrs_model)")

    pred = get_predictor(
        net, params, args.brs_mode,
        zoom_in_params={"target_size": args.zoom_target})
    pred.set_input_image(jnp.asarray(norm))

    clicker = Clicker()
    prob = None
    for y, x, pos in parse_clicks(args.clicks):
        clicker.add_click(Click(pos, (y, x)))
        prob = np.asarray(pred.get_prediction(clicker))
        print(f"click ({y:.0f},{x:.0f},{'+' if pos else '-'}): "
              f"fg {float((prob > 0.5).mean()):.1%}")

    save_indexed_png(args.output, (prob > 0.5).astype(np.uint8))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
