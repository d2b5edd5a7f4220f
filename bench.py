"""Headline benchmark: 480p multi-object mask propagation FPS per chip.

Protocol (mirrors the reference's interactive hot path,
inference_core.py:122-200): one interaction on frame 0 of a 60-frame
480p video with 3 objects, then a full forward propagation pass —
each frame runs the query encoder, the top-k=50 memory read over the
growing bank (mem_freq=5), the decoder, soft aggregation, and the memory
encoder. Measured on a session with warm compile caches but cold
per-frame feature buffers (the query encode is part of the work, as in
the reference's timing).

Baseline: MiVOS propagation runs ~10 FPS at 480p on an RTX 2080Ti (the
repo publishes no FPS; 10 FPS is the STM-family figure its speed claims
derive from — see BASELINE.md). vs_baseline = fps / 10.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 10.0
T, RH, RW, K = 60, 480, 854, 3


def kernel_gate() -> dict:
    """On-chip Pallas kernel gate (VERDICT r3 item 6): before a headline
    number is committed, the fused memory-read kernel must match the
    xla_exact oracle on real encoder banks at M~21k and M~42k (mean
    readout error < 1e-3 of readout scale). A kernel edit that breaks
    accuracy fails the BENCH here, loudly, instead of shipping a fast
    wrong number (the round-2 77.5 FPS was exactly that failure mode).
    Skip with MIVOS_SKIP_KERNEL_GATE=1 (e.g. CPU smoke runs)."""
    if os.environ.get("MIVOS_SKIP_KERNEL_GATE") == "1":
        return {"ok": None, "skipped": True}
    here = os.path.dirname(os.path.abspath(__file__))
    # Per-process gate-report path: two concurrent bench runs must not
    # clobber each other's report and read the other run's numbers.
    gate_json = f"/tmp/pallas_kernel_gate.{os.getpid()}.json"
    cmd = [sys.executable, os.path.join(here, "scripts",
                                        "pallas_kernel_check.py"),
           "--gate-only", "--out", gate_json]
    env = {**os.environ,
           "PYTHONPATH": here + os.pathsep + os.environ.get(
               "PYTHONPATH", "")}
    for attempt in (1, 2):   # axon registration is transiently flaky
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=here,
                           env=env)
        if r.returncode == 0 and "PALLAS-KERNEL-OK" in r.stdout:
            break
        sys.stderr.write(f"kernel gate attempt {attempt} failed "
                         f"(rc={r.returncode})\n")
    if r.returncode != 0 or "PALLAS-KERNEL-OK" not in r.stdout:
        sys.stderr.write("KERNEL GATE FAILED\n--- stdout ---\n"
                         + r.stdout[-4000:] + "\n--- stderr ---\n"
                         + r.stderr[-4000:] + "\n")
        sys.exit(1)
    with open(gate_json) as f:
        rep = json.load(f)
    worst = max(x["pallas_mean_abs_err"] / max(x["readout_scale"], 1e-9)
                for x in rep["reports"])
    return {"ok": True, "worst_mean_err_frac": round(worst, 6)}


def main():
    gate = kernel_gate()
    import jax
    import jax.numpy as jnp

    import mivos_tpu  # noqa: F401  (enables persistent compile cache)
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.core.inference import InferenceCore
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.utils.tensor import one_hot_mask

    rng = np.random.RandomState(0)
    # Production TPU configuration: bf16 conv towers + bf16 memory bank
    # + fused Pallas top-k memory read (read_backend='auto').
    prop = PropagationNetwork(top_k=50, dtype="bfloat16")
    fuse = FusionNet(dtype="bfloat16")
    f0 = jnp.zeros((480, 864, 3))
    m0 = jnp.zeros((K, 480, 864, 1))
    pp = prop.init(jax.random.PRNGKey(0), f0, m0, f0)
    fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((K, 480, 864, 3)),
                   jnp.zeros((K, 480, 864, 1)), jnp.zeros((K, 480, 864, 1)),
                   jnp.zeros((K, 480, 864, 2)), jnp.zeros((K, 2)))

    # Video frames are uploaded to the device ONCE, outside the timed
    # region — matching the reference protocol, where DAVISProcessor
    # receives GPU-resident images and interact() timing excludes the
    # video upload (reference eval_interactive_davis.py:49-56,83).
    images = jax.device_put(rng.rand(T, RH, RW, 3).astype(np.float32))
    images.block_until_ready()
    # The interaction masks stay device-resident: in the real pipeline
    # they are produced ON device by S2M/f-BRS (reference
    # davis_processor.py:66-69 hands interact() a GPU tensor), so the
    # 6.6 MB host->device upload is not part of the propagation round.
    # One DISTINCT mask per measured session: the runtime memoizes
    # bitwise-identical executions, so repeating one mask would let
    # later sessions skip the actual compute.
    def mk_mask(seed):
        labels = jnp.asarray(
            np.random.RandomState(seed).randint(0, K + 1, (RH, RW)))
        fg = one_hot_mask(labels, K)
        bg = 1 - fg.sum(0, keepdims=True)
        return jnp.concatenate([bg, fg], 0)

    masks = [mk_mask(s) for s in range(8)]
    jax.block_until_ready(masks)

    mem = MemoryConfig(top_k=50, mem_freq=5)

    # Warm the compile caches with a throwaway session.
    warm = InferenceCore(prop, pp, fuse, fp, images, K, mem=mem)
    warm.interact(masks[7], 0)
    del warm

    # Measured: fresh sessions, one full interaction each (forward pass
    # over T-1 frames with per-frame query encode + memory read +
    # memorize). The headline value is the MEDIAN of 7 sessions — the
    # shared chip has ~10% run-to-run spread (PERF.md), and a median
    # with the spread in the JSON makes BENCH_r* numbers comparable
    # across rounds without prose.
    fps = []
    for s in range(7):
        core = InferenceCore(prop, pp, fuse, fp, images, K, mem=mem)
        t0 = time.time()
        core.interact(masks[s], 0)
        dt = time.time() - t0
        fps.append((T - 1) / dt)
    fps.sort()
    median = fps[len(fps) // 2]

    print(json.dumps({
        "metric": "propagation_fps_480p_3obj",
        "value": round(median, 2),
        "unit": "frames/s",
        "vs_baseline": round(median / BASELINE_FPS, 2),
        "spread": [round(fps[0], 2), round(fps[-1], 2)],
        "best": round(fps[-1], 2),
        "sessions": len(fps),
        "kernel_gate": gate,
    }))


if __name__ == "__main__":
    main()
