"""Long-video multi-round measurement on the real TPU (VERDICT r1 #8).

300-frame synthetic 480p video, three interaction rounds, comparing the
query-cache policies:

  eager  (default): batched pre-encode before every pass -> ALL rounds
          run the scan in 'cached' mode
  lazy   (legacy):  round 1 encodes batch-1 in-scan; pre-encode starts
          at round 2
  off    :          every pass re-encodes queries in-scan

Reports per-round wall times (one JSON line). Timing through the tunnel:
each round ends in the host label fetch inside interact(), which forces
completion, and the masks differ per round so nothing is memoized.

--limit (VERDICT r3 item 8): one session at the time-bucket/HBM edge —
960 frames of 480p with mem_freq=1 so the forward pass's 959 would-be
commits CROSS bank_cap_frames=512 and exercise the adaptive commit
thinning ON CHIP (core/inference.py::_effective_mem_freq), with the
query cache auto-disabled by its byte cap (960 frames x ~22 MB/frame
>> query_cache_bytes — the policy boundary, not a crash). Reports
per-round seconds, steady FPS and the chip's peak HBM bytes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/long_video_bench.py [--limit]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.models.propagation import PropagationNetwork

T, H, W, K = 300, 480, 854, 2


def mk_mask(seed):
    r = np.random.RandomState(seed)
    labels = r.randint(0, K + 1, (H, W))
    return np.stack([(labels == i) for i in range(K + 1)]
                    ).astype(np.float32)[..., None]


CONFIGS = {
    "eager": dict(qcache_eager=True),
    "lazy": dict(qcache_eager=False),
    "off": dict(cache_queries=False),
}


def run_config(prop, params, name, kw, t, seed_base, rounds=3):
    """One multi-round session. Inputs are SEEDED PER CONFIG: the
    runtime memoizes bitwise-identical executions, so reusing the same
    video or masks across configs would fake the later configs'
    timings."""
    rng = np.random.RandomState(seed_base)
    images = (rng.rand(t, H, W, 3) * 255).astype(np.uint8)
    masks = [mk_mask(seed_base + s) for s in range(1, rounds + 1)]
    idxs = [0, t - 1, t // 2, t // 4][:rounds]
    mem = MemoryConfig(top_k=50, mem_freq=5,
                       query_cache_bytes=8 << 30, **kw)
    core = InferenceCore(prop, params, None, None, images, K, mem=mem)
    times = []
    for m, i in zip(masks, idxs):
        t0 = time.time()
        core.interact(m, idx=i)
        times.append(round(time.time() - t0, 2))
    del core
    return times


def run_limit(prop, params):
    """960-frame 480p session at the bank/HBM boundary (see module
    docstring). Gates: the session completes, the bank stays at its
    512-frame cap (thinned commits), labels are sane."""
    t = 960
    rng = np.random.RandomState(77)
    images = (rng.rand(t, H, W, 3) * 255).astype(np.uint8)
    mem = MemoryConfig(top_k=50, mem_freq=1)   # 959 commits -> thinning
    core = InferenceCore(prop, params, None, None, images, K, mem=mem)
    assert not core._qcache_enabled, (
        "query cache should auto-disable past its byte cap at 960 frames")
    report = {"frames": t, "hw": [H, W], "objects": K,
              "mem_freq_requested": 1,
              "bank_cap_frames": mem.bank_cap_frames,
              "qcache_enabled": core._qcache_enabled}
    times = []
    for s, idx in enumerate([0, t - 1, t // 2]):
        t0 = time.time()
        out = core.interact(mk_mask(100 + s), idx=idx)
        times.append(round(time.time() - t0, 2))
        print(f"round {s} (interact @{idx}): {times[-1]}s", flush=True)
    assert out.shape == (t, H, W) and out.max() <= K
    assert core.bank.cap <= mem.bank_cap_frames, core.bank.cap
    report["rounds_s"] = times
    # Steady-state FPS from the fastest round (compiles can land in any
    # round; same convention as the 300-frame benchmark below).
    report["best_round_fps"] = round((t - 1) / min(times), 1)
    stats = jax.local_devices()[0].memory_stats() or {}
    report["peak_hbm_gb"] = round(
        stats.get("peak_bytes_in_use", 0) / (1 << 30), 2)
    # memory_stats() is empty through the axon tunnel; report the
    # post-session RESIDENT device bytes (params + video + bank +
    # schedule arrays) from the live-array set as the portable floor.
    report["resident_hbm_gb"] = round(sum(
        x.nbytes for x in jax.live_arrays()) / (1 << 30), 2)
    report["bank_slots_committed"] = int(core.bank.num_slots)
    print(json.dumps(report))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", action="store_true",
                    help="960-frame bank-cap/HBM boundary session only")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    prop = PropagationNetwork(top_k=50, dtype="bfloat16",
                              read_backend="pallas")
    f0 = jnp.zeros((128, 160, 3))
    params = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, 128, 160, 1)), f0)
    if args.limit:
        run_limit(prop, params)
        return

    # Warmup: short sessions per config compile the chunk-size scan
    # executables. T-shaped executables (big bank-capacity buckets,
    # (T,...)-shaped qcache writes/slices) CANNOT be precompiled by a
    # short session, so early measured rounds still carry remote
    # compiles — which is why the steady-state figure below is taken
    # from each config's LAST round, after every executable has been
    # seen at least once.
    for i, (name, kw) in enumerate(CONFIGS.items()):
        t0 = time.time()
        run_config(prop, params, name, kw, t=33, seed_base=1000 + 50 * i)
        print(f"warmup {name}: {time.time()-t0:.1f}s", flush=True)

    rounds = 4
    report = {}
    for i, (name, kw) in enumerate(CONFIGS.items()):
        report[name] = run_config(prop, params, name, kw, t=T,
                                  seed_base=2000 + 50 * i, rounds=rounds)
        print(f"{name}: rounds {report[name]}", flush=True)

    fps = {name: round((rounds * (T - 1)) / sum(ts), 1)
           for name, ts in report.items()}
    # Bank-capacity buckets grow with the interaction count, so a
    # remote compile can land in ANY round; the compile-free steady
    # state is each config's fastest round.
    fps_steady = {name: round((T - 1) / min(ts), 1)
                  for name, ts in report.items()}
    print(json.dumps({"rounds_s": report, "session_fps": fps,
                      "best_round_fps": fps_steady,
                      "frames": T, "hw": [H, W], "objects": K}))


if __name__ == "__main__":
    main()
