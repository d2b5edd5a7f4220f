"""Sweep the Pallas kernel's n_refine knob on REAL encoder banks (TPU):
accuracy vs xla_exact and device-side timing per setting, to place the
default at the speed/tightness knee (see ops/pallas/memory_read.py —
each refine pass costs ~0.6-0.9 ms and shrinks the threshold bracket
~7x).

Usage: python scripts/refine_sweep.py [--weights weights/prop_synthetic.npz]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.ops.memory_read import memory_read
from pallas_kernel_check import TOP_K, encoder_banks


def time_read(mk, mv, q, valid, n_refine, iters=50):
    q0 = q

    def body(i, carry):
        qq, acc = carry
        out = memory_read(mk, mv, qq, top_k=TOP_K, valid=valid,
                          backend="pallas", n_refine=n_refine)
        m = jnp.mean(out)
        return q0 * (1.0 + m * 1e-3) + i * 1e-6, acc + m

    fn = jax.jit(lambda qq: jax.lax.fori_loop(0, iters, body, (qq, 0.0))[1])
    np.asarray(fn(q))
    best = np.inf
    for rep in range(1, 3):
        t0 = time.time()
        np.asarray(fn(q * (1.0 + rep * 1e-4)))
        best = min(best, (time.time() - t0) / iters * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/prop_synthetic.npz")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    mk, mv, q = encoder_banks(args.weights, n_frames=13)
    m = mk.shape[1]
    valid = jnp.arange(m) < (m - 800)
    mkb, mvb = mk.astype(jnp.bfloat16), mv.astype(jnp.bfloat16)

    ref = np.asarray(memory_read(mk, mv, q, top_k=TOP_K, valid=valid,
                                 backend="xla_exact"))
    scale = float(np.abs(ref).max())

    rows = []
    for r in (0, 1, 2, 3):
        out = np.asarray(memory_read(mkb, mvb, q, top_k=TOP_K, valid=valid,
                                     backend="pallas", n_refine=r))
        err = np.abs(out - ref)
        ms = time_read(mkb, mvb, q, valid, r)
        rows.append({"n_refine": r, "ms": round(ms, 3),
                     "mean_abs_err": float(err.mean()),
                     "max_abs_err": float(err.max()),
                     "mean_pct_of_scale": round(float(err.mean()) / scale
                                                * 100, 4),
                     "max_pct_of_scale": round(float(err.max()) / scale
                                               * 100, 2)})
        print(rows[-1], flush=True)

    with open("/tmp/refine_sweep.json", "w") as f:
        json.dump({"M": int(m), "scale": scale, "rows": rows}, f, indent=1)
    print("REFINE-SWEEP-DONE")


if __name__ == "__main__":
    main()
