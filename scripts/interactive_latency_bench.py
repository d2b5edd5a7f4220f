"""Interactive-latency benchmark on the real TPU: the two user-facing
response times of the GUI loop (reference interactive_gui.py on_release
-> FBRSController / S2MController):

  * f-BRS click -> mask: ZoomIn + on-device L-BFGS (maxfun 20) feature
    optimization + flip-averaged prediction at 480p.
  * S2M scribble -> mask: per-object 6-channel DeepLabV3+ forward at
    480p, 3 objects.

Random weights (latency is weight-independent); inputs perturbed per
iteration so the runtime cannot memoize repeats; every timed iteration
ends in a host fetch. First iteration = compile, excluded via warmup.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/interactive_latency_bench.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, K = 480, 854, 3


def bench_fbrs(n_iter=8):
    from mivos_tpu.interactive.clicker import Click, Clicker
    from mivos_tpu.interactive.fbrs_predictor import get_predictor
    from mivos_tpu.models.fbrs import FBRSDeepLabModel

    net = FBRSDeepLabModel()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                      jnp.zeros((1, 2, 2)))
    pred = get_predictor(net, params, "f-BRS-B",
                         zoom_in_params={"target_size": 480,
                                         "expansion_ratio": 1.4})
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    pred.set_input_image(image)

    clicker = Clicker()
    lat = []
    for i in range(n_iter):
        y = 100.0 + 17.0 * i + rng.rand()      # distinct clicks: no
        x = 200.0 + 23.0 * i + rng.rand()      # memoized repeats
        clicker.add_click(Click(i % 3 != 2, (y, x)))
        t0 = time.time()
        prob = pred.get_prediction(clicker)
        np.asarray(prob)                        # force host fetch
        lat.append(time.time() - t0)
    return lat


def bench_s2m(n_iter=6):
    from mivos_tpu.interactive.s2m_controller import S2MController
    from mivos_tpu.models.s2m import S2MNetwork

    from mivos_tpu.utils.tensor import pad_divide_by

    net = S2MNetwork(dtype="bfloat16")
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((K, H, W, 6)))
    ctrl = S2MController(net, params, K, ignore_class=255)
    rng = np.random.RandomState(1)
    # The controller takes the session's PADDED image (as DAVISProcessor
    # passes get_image()); scribbles are raw-grid.
    image, _ = pad_divide_by(
        jnp.asarray(rng.rand(H, W, 3).astype(np.float32)), 16)

    lat = []
    for i in range(n_iter):
        scr = np.full((H, W), 255, np.int32)
        r0 = 40 + 30 * i
        scr[r0:r0 + 6, 100:700] = 1 + (i % K)   # distinct stroke/round
        scr[r0 + 60:r0 + 66, 100:700] = 0
        prev = np.zeros(image.shape[:2], np.uint8)   # padded grid
        t0 = time.time()
        mask = ctrl.interact(image, prev, scr, aggregate_hard=True)
        np.asarray(mask)
        lat.append(time.time() - t0)
    return lat


def main():
    print("devices:", jax.devices(), flush=True)
    fbrs = bench_fbrs()
    print("fbrs click latencies:", [round(t, 3) for t in fbrs], flush=True)
    s2m = bench_s2m()
    print("s2m scribble latencies:", [round(t, 3) for t in s2m], flush=True)

    # Warm = sub-second iterations; the rest are one-time compiles (the
    # first clicks, plus a recompile whenever ZoomIn's object ROI grows
    # into a new crop bucket).
    fbrs_warm = sorted(t for t in fbrs if t < 1.0)
    s2m_warm = sorted(t for t in s2m if t < 1.0)
    print(json.dumps({
        "fbrs_click_median_ms": round(1e3 * fbrs_warm[len(fbrs_warm) // 2], 1),
        "s2m_scribble_median_ms": round(1e3 * s2m_warm[len(s2m_warm) // 2], 1),
        "fbrs_compiles": len(fbrs) - len(fbrs_warm),
        "s2m_compiles": len(s2m) - len(s2m_warm),
        "hw": [H, W], "objects": K}))


if __name__ == "__main__":
    main()
