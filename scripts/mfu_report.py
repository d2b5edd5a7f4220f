"""MFU accounting for the propagation step (VERDICT r2 item 8): where
do the FLOPs/bytes go, and how far from the chip's ceiling is the
shipping 480p path?

XLA's compiled-executable cost model (`compile().cost_analysis()`)
gives FLOPs + bytes for each phase of one propagated frame at the
production shape (480p padded, K=3, M=20480-position bank, bf16):
query encode, memory read, decode, memorize. MFU = measured
frames/s x FLOPs/frame / peak; the peak used is TPU v5e bf16
(197 TFLOP/s). Run bench.py (or pass --fps) for the measured rate.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/mfu_report.py --fps 77.5
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

H, W, K, M_BANK = 480, 864, 3, 20480  # padded 480p, 3 objects, ~38 frames
PEAK_BF16 = 197e12                    # TPU v5e bf16 peak FLOP/s


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns [dict]
        c = c[0]
    return {"gflops": float(c.get("flops", 0.0)) / 1e9,
            "gbytes": float(c.get("bytes accessed", 0.0)) / 1e9}


def measure_ms(fn, xs, reps: int = 3) -> float:
    """Measured per-call device time: N calls run inside ONE jitted
    lax.scan reduced to a scalar, so the tunnel's per-dispatch latency
    and download cost amortize away (verify-skill timing protocol); the
    stacked inputs are perturbed per repetition because bitwise-equal
    executions are memoized by the remote runtime."""
    import time

    @jax.jit
    def run(stack):
        def body(c, x):
            out = fn(x)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(out))
            return c + s, None
        return jax.lax.scan(body, jnp.float32(0.0), stack)[0]

    n = jax.tree.leaves(xs)[0].shape[0]
    np.asarray(run(xs))  # compile + warm
    best = float("inf")
    for rep in range(1, reps + 1):
        pert = jax.tree.map(lambda a: a * (1.0 + rep * 1e-3), xs)
        np.asarray(jax.tree.leaves(pert)[0][0, 0])  # materialize inputs
        t0 = time.time()
        np.asarray(run(pert))
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=float, default=None,
                    help="measured session FPS (bench.py); enables MFU")
    ap.add_argument("--measure", type=int, default=0, metavar="N",
                    help="ALSO time each phase on the chip (N scan "
                         "steps per executable; adds one remote compile "
                         "per phase)")
    args = ap.parse_args()

    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.ops.aggregate import aggregate_wbg

    print("devices:", jax.devices(), flush=True)
    net = PropagationNetwork(top_k=50, dtype="bfloat16")
    rng = np.random.RandomState(0)
    f0 = jnp.zeros((64, 112, 3))
    params = net.init(jax.random.PRNGKey(0), f0,
                      jnp.zeros((K, 64, 112, 1)), f0)
    from mivos_tpu.utils.tensor import cast_params_bf16

    params = cast_params_bf16(params)

    image = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(K, H, W, 1).astype(np.float32))
    h16, w16 = H // 16, W // 16
    n16 = h16 * w16
    bank_k = jnp.zeros((K, M_BANK, 128), jnp.bfloat16)
    bank_v = jnp.zeros((K, M_BANK, 512), jnp.bfloat16)
    valid = jnp.ones((M_BANK,), bool)
    f16 = jnp.zeros((1, h16, w16, 1024), jnp.bfloat16)
    f8 = jnp.zeros((1, h16 * 2, w16 * 2, 512), jnp.bfloat16)
    f4 = jnp.zeros((1, h16 * 4, w16 * 4, 256), jnp.bfloat16)
    k16 = jnp.zeros((1, h16, w16, 128), jnp.bfloat16)
    v16 = jnp.zeros((1, h16, w16, 512), jnp.bfloat16)

    phases = {}
    phases["query_encode"] = cost(
        lambda p, im: net.apply(p, im, method="get_query_values"),
        params, image)
    phases["read_decode"] = cost(
        lambda p, bk, bv, vl, a, b, c, d, e: net.apply(
            p, bk, bv, vl, a, b, c, d, e, method="segment_with_query"),
        params, bank_k, bank_v, valid, f16, f8, f4, k16, v16)
    phases["memorize"] = cost(
        lambda p, im, m: net.apply(p, im, m, method="memorize"),
        params, image, masks)
    phases["aggregate"] = cost(
        lambda m: aggregate_wbg(m, keep_bg=True), masks)

    # Isolate the raw memory read from read_decode (the decoder is the
    # remainder): same shapes through ops.memory_read directly.
    from mivos_tpu.ops.memory_read import memory_read

    q = jnp.zeros((n16, 128), jnp.bfloat16)
    phases["memory_read_only"] = cost(
        lambda bk, bv, qq, vl: memory_read(bk, bv, qq, top_k=50, valid=vl,
                                           backend="xla_approx"),
        bank_k, bank_v, q, valid)

    if args.measure:
        n = args.measure
        rng2 = np.random.RandomState(1)
        ims = jnp.asarray(rng2.rand(n, H, W, 3).astype(np.float32))
        msk = jnp.asarray(rng2.rand(n, K, H, W, 1).astype(np.float32))
        k16s = jnp.asarray(rng2.rand(n, 1, h16, w16, 128)
                           .astype(np.float32)).astype(jnp.bfloat16)
        qs = jnp.asarray(rng2.rand(n, n16, 128)
                         .astype(np.float32)).astype(jnp.bfloat16)
        bk = jnp.asarray(rng2.randn(K, M_BANK, 128)
                         .astype(np.float32)).astype(jnp.bfloat16)
        bv = jnp.asarray(rng2.randn(K, M_BANK, 512)
                         .astype(np.float32)).astype(jnp.bfloat16)

        timed = {}
        timed["query_encode"] = measure_ms(
            lambda im: net.apply(params, im, method="get_query_values"),
            ims)
        timed["read_decode"] = measure_ms(
            lambda kk: net.apply(params, bk, bv, valid, f16, f8, f4, kk,
                                 v16, method="segment_with_query"), k16s)
        timed["memorize"] = measure_ms(
            lambda mm: net.apply(params, image, mm, method="memorize"), msk)
        for backend in ("pallas", "xla_approx"):
            timed[f"memory_read_only_{backend}"] = measure_ms(
                lambda qq, b=backend: memory_read(
                    bk, bv, qq, top_k=50, valid=valid, backend=b), qs)
        step_ms = (timed["query_encode"] + timed["read_decode"]
                   + timed["memorize"])
        timed["frame_total"] = step_ms
        timed["device_only_fps"] = 1e3 / step_ms
        for k2, v2 in sorted(timed.items()):
            print(f"  measured {k2}: {v2:.2f}"
                  f"{' ms' if 'fps' not in k2 else ' fps'}", flush=True)

    total = sum(p["gflops"] for n, p in phases.items()
                if n not in ("memory_read_only",))
    report = {"per_frame_gflops": round(total, 2),
              "phases": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                         for k, v in phases.items()},
              "shape": {"hw": [H, W], "objects": K, "bank_m": M_BANK}}
    if args.measure:
        report["measured_ms"] = {k: round(v, 3) for k, v in timed.items()}
    if args.fps:
        mfu = args.fps * total * 1e9 / PEAK_BF16
        report["fps"] = args.fps
        report["mfu_at_fps"] = round(mfu, 4)
        report["note"] = ("session wall time is transfer/dispatch-bound "
                          "through the axon tunnel; device-only MFU is "
                          "higher (see PERF.md)")
    print(json.dumps(report, indent=1))
    with open("/tmp/mfu_report.json", "w") as f:
        json.dump(report, f, indent=1)
    print("MFU-OK")


if __name__ == "__main__":
    main()
