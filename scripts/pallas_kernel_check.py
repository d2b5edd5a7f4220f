"""Direct on-TPU validation of the Mosaic-compiled fused memory-read
kernel at PRODUCTION shapes (VERDICT r2 item 5): memory_read_pallas vs
the xla_exact sort-based oracle on the same banks — kernel-level, not
session-level (the envelope already covers the session).

Two input regimes:

  encoder  (GATED): banks built by the REAL memorize path — the
    pretrained encoder over synthetic 480p frames, ~20k positions —
    i.e. the statistics the kernel actually sees in production.
  iid-gaussian (REPORTED, not gated): the adversarial worst case.
    With iid keys the top-k order statistics are maximally tied (the
    gap between the k-th and (k+j)-th affinity is O(1e-3) sigma), so
    ANY approximate top-k diverges: the kernel's candidate-bin
    threshold admits a few extra near-threshold entries (superset
    semantics, each with weight ~ the k-th weight), and the previous
    production path (approx_max_k, recall 0.95) MISSES entries
    instead. Real encoder affinities are well separated (the reference
    credits +1.2 AUC to top-k precisely because the top entries stand
    out, README.md:87), which regime 1 measures.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pallas_kernel_check.py \
    [--weights weights/prop_synthetic.npz]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.ops.memory_read import memory_read

K, N, CK, CV, TOP_K = 3, 1620, 128, 512, 50
H, W = 480, 854  # raw 480p; pads to 480x864 -> n16 = 30*54 = 1620


def time_backend(mk, mv, q, valid, backend, iters=50):
    """Tunnel-safe timing (verify skill): per-call dispatch through the
    tunnel costs ~20 ms, so the chained loop lives INSIDE one jitted
    fori_loop — each iteration's query is perturbed by the previous
    readout's mean (data dependence defeats both reordering and the
    bitwise-execution memoizer) and ONE host fetch forces the chain."""
    q0 = q

    def body(i, carry):
        qq, acc = carry
        out = memory_read(mk, mv, qq, top_k=TOP_K, valid=valid,
                          backend=backend)
        m = jnp.mean(out)
        return q0 * (1.0 + m * 1e-3) + i * 1e-6, acc + m

    fn = jax.jit(lambda qq: jax.lax.fori_loop(0, iters, body, (qq, 0.0))[1])
    np.asarray(fn(q))                # compile + warm
    best = np.inf
    for rep in range(1, 3):
        t0 = time.time()
        np.asarray(fn(q * (1.0 + rep * 1e-4)))
        best = min(best, (time.time() - t0) / iters * 1e3)
    return best


def compare(mk, mv, q, valid, tag, dtype, with_approx=True):
    out_p = np.asarray(memory_read(mk, mv, q, top_k=TOP_K, valid=valid,
                                   backend="pallas"), np.float32)
    out_e = np.asarray(memory_read(mk, mv, q, top_k=TOP_K, valid=valid,
                                   backend="xla_exact"), np.float32)
    scale = float(np.abs(out_e).mean())
    rep = {"regime": tag, "M": int(mk.shape[1]), "dtype": dtype,
           "readout_scale": scale,
           "pallas_max_abs_err": float(np.abs(out_p - out_e).max()),
           "pallas_mean_abs_err": float(np.abs(out_p - out_e).mean())}
    if with_approx:
        # The previous production path, for context.
        out_a = np.asarray(memory_read(mk, mv, q, top_k=TOP_K, valid=valid,
                                       backend="xla_approx"), np.float32)
        rep["approx_max_abs_err"] = float(np.abs(out_a - out_e).max())
        rep["approx_mean_abs_err"] = float(np.abs(out_a - out_e).mean())
    print(json.dumps(rep), flush=True)
    return rep


def encoder_banks(weights: str, n_frames: int):
    """Real (K, F*1620, CK/CV) banks: memorize pretrained-encoder
    features of synthetic 480p frames (the production bank builder)."""
    from mivos_tpu.checkpoint.npz import load_params_npz
    from mivos_tpu.data.transforms import im_normalize
    from mivos_tpu.generation.synthetic import (labels_to_onehot,
                                                synthetic_sequence)
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.utils.tensor import pad_divide_by

    net = PropagationNetwork(top_k=TOP_K)
    if weights:
        params = load_params_npz(weights)
    else:  # gate fallback: random towers still give encoder-statistics
        f0 = jnp.zeros((128, 160, 3))
        params = net.init(jax.random.PRNGKey(0), f0,
                          jnp.zeros((K, 128, 160, 1)), f0)
    mem_fn = jax.jit(lambda p, f, m: net.apply(p, f, m, method="memorize"))
    q_fn = jax.jit(lambda p, f: net.apply(p, f, method="get_query_values"))

    images, labels = synthetic_sequence(7, n_frames + 1, H, W, K)
    images = im_normalize(images).astype(np.float32)
    mks, mvs = [], []
    for t in range(n_frames):
        frame, _ = pad_divide_by(jnp.asarray(images[t]), 16)
        masks, _ = pad_divide_by(
            jnp.asarray(labels_to_onehot(labels[t], K)), 16)
        mk, mv = mem_fn(params, frame, masks)
        mks.append(mk)
        mvs.append(mv)
    qframe, _ = pad_divide_by(jnp.asarray(images[n_frames]), 16)
    k16 = q_fn(params, qframe)[3]
    q = k16.reshape(-1, CK)
    return (jnp.concatenate(mks, axis=1), jnp.concatenate(mvs, axis=1), q)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights/prop_synthetic.npz")
    ap.add_argument("--gate-only", action="store_true",
                    help="bench.py / verify-skill gate mode (VERDICT r3 "
                    "item 6): encoder regime ONLY at M~21k AND M~42k, "
                    "pallas-vs-exact, mean-error gate tightened to 1e-3 "
                    "of readout scale; skips the iid regime, the "
                    "xla_approx context numbers and the timing loops. "
                    "Falls back to random-init weights (still real "
                    "encoder-statistics banks) when --weights is absent "
                    "so a wiped weights/ dir cannot mask a kernel bug.")
    ap.add_argument("--out", default="/tmp/pallas_kernel_check.json")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    reports = []

    import os
    weights = args.weights
    if args.gate_only and not os.path.exists(weights):
        print(f"[gate] {weights} missing -> random-init encoder banks",
              flush=True)
        weights = None

    if args.gate_only:
        # Bank scales from VERDICT r3 item 6: the production M (~21k,
        # 13 frames) and the doubled long-session M (~42k, 26 frames).
        mk, mv, q = encoder_banks(weights, n_frames=26)
        m = mk.shape[1]
        half = jnp.arange(m) < (m // 2 - 800)
        valid = jnp.arange(m) < (m - 800)
        for dt in (jnp.float32, jnp.bfloat16):
            reports.append(compare(mk[:, :m // 2].astype(dt),
                                   mv[:, :m // 2].astype(dt), q, half[:m // 2],
                                   "encoder", dt.__name__, with_approx=False))
        reports.append(compare(mk.astype(jnp.bfloat16),
                               mv.astype(jnp.bfloat16), q, valid,
                               "encoder", "bfloat16", with_approx=False))
        timing = {}
    else:
        # Regime 1 (gated): real encoder banks, 13 frames -> M = 21060.
        mk, mv, q = encoder_banks(weights, n_frames=13)
        m = mk.shape[1]
        valid = jnp.arange(m) < (m - 800)   # partial tail, as in sessions
        for dt in (jnp.float32, jnp.bfloat16):
            reports.append(compare(mk.astype(dt), mv.astype(dt), q, valid,
                                   "encoder", dt.__name__))

        # Regime 2 (reported): adversarial iid-gaussian ties.
        rng = np.random.RandomState(0)
        for m2 in (20480, 40960):
            gmk = jnp.asarray(rng.randn(K, m2, CK).astype(np.float32))
            gmv = jnp.asarray(rng.randn(K, m2, CV).astype(np.float32))
            gq = jnp.asarray(rng.randn(N, CK).astype(np.float32))
            reports.append(compare(gmk, gmv, gq, None, "iid-gaussian",
                                   "float32"))

        # Timing at the production shape (bf16 banks, real-bank statistics).
        timing = {}
        mkb, mvb = mk.astype(jnp.bfloat16), mv.astype(jnp.bfloat16)
        for backend in ("pallas", "xla_approx", "xla_exact"):
            timing[backend] = round(
                time_backend(mkb, mvb, q, valid, backend), 3)
            print(f"timing {backend}: {timing[backend]} ms", flush=True)

    # Gates apply to the production regime only. The kernel's support is
    # a SUPERSET of the exact top-k (never misses an entry); with the
    # top-2-per-bin phase A the bisected threshold lands at the k-th
    # affinity and residual error comes solely from rows whose
    # k-th/(k+1)-th affinities fall inside the ~7e-6-nat bisection
    # resolution (boundary near-ties at ~w_k each — an ambiguity the
    # reference's own torch.topk resolves arbitrarily by index). Gate
    # the mean at 1% of readout scale and the element max at 30%; at
    # the shipping default (n_refine=0) the measured figures are 0.067%
    # mean / 9.5% max (one near-tie row's worst channel out of 2.5M
    # elements) — refine passes measurably change nothing on encoder
    # banks (scripts/refine_sweep.py) and remain a safety knob. Gate
    # mode tightens the mean gate to 1e-3 of readout scale (VERDICT r3
    # item 6's "fails loudly on >1e-3 readout error").
    mean_gate = 1e-3 if args.gate_only else 1e-2
    for r in reports:
        if r["regime"] != "encoder":
            continue
        scale = max(r["readout_scale"], 1e-9)
        assert r["pallas_max_abs_err"] < 0.3 * scale, r
        assert r["pallas_mean_abs_err"] < mean_gate * scale, r
    out = {"reports": reports, "timing_ms": timing,
           "gate_only": args.gate_only, "mean_gate_frac": mean_gate,
           "weights": weights or "random-init"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("PALLAS-KERNEL-OK")


if __name__ == "__main__":
    main()
