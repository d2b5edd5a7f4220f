"""Same-process A/B of the opt-in slim decoder (dec_width=0.5) against
the reference-width decoder on the headline bench protocol.

The decoder is the largest per-frame FLOP consumer (~60% of the
propagation step, PERF.md MFU table) and it is an architectural cost
inherited from the reference (each object decodes its own readout,
prop_net.py:172-176). `PropagationNetwork(dec_width=0.5)` halves every
internal decoder channel (conv FLOPs scale with width^2; XLA cost
analysis: query+read+decode 686.6 -> 280.8 GFLOP/frame at 480p K=3) —
an opt-in for from-scratch training, since the published .pth decoders
require width 1.0.

Protocol: identical to bench.py (60-frame 480p, 3 objects, interact on
frame 0, full forward pass; distinct per-session masks so nothing is
memoized; warm session per config absorbs compiles). Both configs run
in ONE process back to back, so the numbers are a valid relative A/B
even in a contended window (verify SKILL.md timing rules). FPS is
weight-independent (random init): this measures speed only — accuracy
of a slim net is a from-scratch training question.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/slim_decoder_bench.py
"""
import json
import sys
import time

import jax

if "--smoke" in sys.argv:  # CPU wiring check (tiny shapes, 1 session)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.utils.tensor import one_hot_mask

SMOKE = "--smoke" in sys.argv
T, RH, RW, K = (12, 64, 96, 2) if SMOKE else (60, 480, 854, 3)
SESSIONS = 1 if SMOKE else 3


def mk_mask(seed):
    labels = jnp.asarray(
        np.random.RandomState(seed).randint(0, K + 1, (RH, RW)))
    fg = one_hot_mask(labels, K)
    bg = 1 - fg.sum(0, keepdims=True)
    return jnp.concatenate([bg, fg], 0)


def run_config(width: float, images, seed0: int) -> list:
    prop = PropagationNetwork(top_k=50, dtype="bfloat16", dec_width=width)
    f0 = jnp.zeros((64, 96, 3))
    m0 = jnp.zeros((K, 64, 96, 1))
    pp = prop.init(jax.random.PRNGKey(0), f0, m0, f0)
    mem = MemoryConfig(top_k=50, mem_freq=5)

    warm = InferenceCore(prop, pp, None, None, images, K, mem=mem)
    t0 = time.time()
    warm.interact(mk_mask(seed0 + 99), 0)
    print(f"width {width}: warm (compiles) {time.time() - t0:.1f}s",
          flush=True)
    del warm

    fps = []
    for s in range(SESSIONS):
        core = InferenceCore(prop, pp, None, None, images, K, mem=mem)
        t0 = time.time()
        core.interact(mk_mask(seed0 + s), 0)
        fps.append(round((T - 1) / (time.time() - t0), 2))
        print(f"width {width}: session {s} {fps[-1]} FPS", flush=True)
    return fps


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(T, RH, RW, 3).astype(np.float32))
    np.asarray(images[0, 0, 0])  # force upload

    out = {}
    # Full width FIRST, slim second: if contention drifts mid-run it
    # biases AGAINST the slim config, keeping the speedup conservative.
    for width in (1.0, 0.5):
        out[str(width)] = run_config(width, images, seed0=int(width * 10))
    med = {w: sorted(v)[len(v) // 2] for w, v in out.items()}
    print(json.dumps({
        "protocol": "bench.py (60f 480p K=3, interact@0)",
        "sessions_per_config": SESSIONS,
        "fps": out,
        "median_fps": med,
        "speedup_slim_vs_ref": round(med["0.5"] / med["1.0"], 3),
    }))


if __name__ == "__main__":
    main()
