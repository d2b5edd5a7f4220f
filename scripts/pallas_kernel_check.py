"""Direct on-TPU validation of the Mosaic-compiled fused memory-read
kernel at PRODUCTION shapes (VERDICT r2 item 5): memory_read_pallas vs
the xla_exact sort-based oracle on the same banks — kernel-level, not
session-level (the envelope already covers the session).

Shapes: the 480p bank (N=1620 queries = 54x30 tokens, K=3 objects,
top_k=50) at M = 20480 and 40960 positions, both fp32 and bf16 banks.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pallas_kernel_check.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.ops.memory_read import memory_read

K, N, CK, CV, TOP_K = 3, 1620, 128, 512, 50


def check(m: int, dtype, rng) -> dict:
    mk = rng.randn(K, m, CK).astype(np.float32)
    mv = rng.randn(K, m, CV).astype(np.float32)
    q = rng.randn(N, CK).astype(np.float32)
    valid = np.arange(m) < int(m * 0.93)  # live-slot mask, partial tail

    mk_d = jnp.asarray(mk, dtype)
    mv_d = jnp.asarray(mv, dtype)
    q_d = jnp.asarray(q, jnp.float32)
    v_d = jnp.asarray(valid)

    out_p = np.asarray(memory_read(mk_d, mv_d, q_d, top_k=TOP_K, valid=v_d,
                                   backend="pallas"), np.float32)
    out_e = np.asarray(memory_read(mk_d, mv_d, q_d, top_k=TOP_K, valid=v_d,
                                   backend="xla_exact"), np.float32)
    diff = np.abs(out_p - out_e)
    scale = np.abs(out_e).mean()
    rep = {
        "M": m, "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                             else dtype),
        "max_abs_err": float(diff.max()),
        "mean_abs_err": float(diff.mean()),
        "readout_scale": float(scale),
        "max_rel_err": float(diff.max() / max(scale, 1e-9)),
    }
    print(json.dumps(rep), flush=True)
    return rep


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    reports = []
    for m in (20480, 40960):
        for dt in (jnp.float32, jnp.bfloat16):
            reports.append(check(m, dt, rng))
    # Gates: fp32 banks must agree to ~1e-3 absolute, bf16 to the bank
    # quantization level (~2e-2 on unit-scale values).
    for r in reports:
        tol = 2e-2 if "bfloat16" in r["dtype"] else 1e-3
        assert r["max_abs_err"] < tol, r
    with open("/tmp/pallas_kernel_check.json", "w") as f:
        json.dump(reports, f, indent=1)
    print("PALLAS-KERNEL-OK")


if __name__ == "__main__":
    main()
