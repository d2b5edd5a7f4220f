"""Label-download codec A/B on the real TPU: packed vs block-sparse vs
a no-download compute ceiling.

The headline session (bench.py protocol: one interaction, 59-frame
forward pass at 480p/3-obj) downloads one label map per frame. With
dense 2-bit packing that is ~101 KB/frame over a ~13 MB/s tunnel —
potentially the critical path of the round. This script measures, in
ONE process (shared warmup where executables allow):

  packed   dense adaptive 2-bit maps (round-2 shipping path)
  block    block-sparse codec (ops/label_codec.py)
  ceiling  same program as `packed` but label blobs never cross the
           link and the render fetch is replaced by a minimal sync —
           the compute-bound upper bound any codec can approach

plus the block codec's mixed-block occupancy (count vs cap) so the
overflow-fallback risk is measured, not guessed.

Timing per SKILL.md: distinct interaction masks per session (the
runtime memoizes bitwise-identical executions), warm sessions only,
best-of-N (shared-chip spread ~10%).
"""
import argparse
import json
import time
import types

import numpy as np

T, RH, RW, K = 60, 480, 854, 3


def build(weights=None):
    import jax
    import jax.numpy as jnp

    import mivos_tpu  # noqa: F401
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork

    prop = PropagationNetwork(top_k=50, dtype="bfloat16")
    fuse = FusionNet(dtype="bfloat16")
    f0 = jnp.zeros((480, 864, 3))
    if weights:
        from mivos_tpu.checkpoint.npz import load_params_npz
        pp = load_params_npz(weights)
    else:
        pp = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, 480, 864, 1)), f0)
    fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((K, 480, 864, 3)),
                   jnp.zeros((K, 480, 864, 1)), jnp.zeros((K, 480, 864, 1)),
                   jnp.zeros((K, 480, 864, 2)), jnp.zeros((K, 2)))
    return prop, pp, fuse, fp


def mk_mask(seed):
    import jax.numpy as jnp
    from mivos_tpu.utils.tensor import labels_to_probs

    labels = jnp.asarray(
        np.random.RandomState(seed).randint(0, K + 1, (RH, RW)))
    return labels_to_probs(labels, K)


def no_download(core):
    """Keep label blobs on device and stub the render; sync via a tiny
    fetch from the LAST chunk's blob (depends on the whole bank chain)."""
    import jax.numpy as jnp

    orig = core.scan_pass
    state = {}

    def wrapped(*args, **kw):
        bk, bv, probs, packed = orig(*args, **kw)
        state["last"] = packed
        return bk, bv, probs, jnp.zeros((1,), jnp.uint8)

    core.scan_pass = wrapped
    core._render_masks = types.MethodType(
        lambda self: self.np_masks, core)
    return lambda: np.asarray(state["last"][-1, :16])


def run_sessions(mk_core, masks, patch=None):
    times = []
    for i, m in enumerate(masks):
        core = mk_core()
        fin = patch(core) if patch else None
        t0 = time.time()
        core.interact(m, 0)
        if fin is not None:
            fin()
        times.append(time.time() - t0)
    return times


def blob_stats(core):
    """Mixed-block occupancy of the last session's blobs."""
    from mivos_tpu.ops.label_codec import layout
    ly = layout(core.nh, core.nw, core._pack_bits, core._block_cap)
    counts = []
    seen = {}
    for ti, (arr, row) in core._label_cache.items():
        if id(arr) not in seen:
            seen[id(arr)] = np.asarray(arr)
        b = seen[id(arr)][row]
        counts.append(int(np.frombuffer(
            b[ly["o_count"]: ly["o_count"] + 4].tobytes(), "<u4")[0]))
    return dict(cap=ly["cap"], frame_bytes=ly["frame_bytes"],
                count_mean=float(np.mean(counts)),
                count_max=int(np.max(counts)),
                overflow_frames=int(sum(c > ly["cap"] for c in counts)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=5)
    ap.add_argument("--weights", default=None,
                    help="npz propagation weights (trained-like labels)")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["packed", "block", "ceiling"])
    args = ap.parse_args()

    import jax
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.core.inference import InferenceCore

    prop, pp, fuse, fp = build(args.weights)
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(T, RH, RW, 3).astype(np.float32))
    _ = np.asarray(images[0, 0, :4])
    masks = [mk_mask(s) for s in range(args.sessions + 3)]
    jax.block_until_ready(masks)

    def mk_core(codec):
        return lambda: InferenceCore(
            prop, pp, fuse, fp, images, K,
            mem=MemoryConfig(top_k=50, mem_freq=5, label_codec=codec))

    out = {}
    configs = [c for c in ("packed", "block", "ceiling")
               if c not in args.skip]
    for cfg in configs:
        codec = "block" if cfg == "block" else "packed"
        patch = no_download if cfg == "ceiling" else None
        print(f"[{cfg}] warming...", flush=True)
        t0 = time.time()
        warm = mk_core(codec)()
        fin = patch(warm) if patch else None
        warm.interact(masks[-1], 0)
        if fin:
            fin()
        print(f"[{cfg}] warm done in {time.time() - t0:.0f}s", flush=True)
        times = run_sessions(mk_core(codec), masks[:args.sessions],
                             patch=patch)
        fps = [(T - 1) / t for t in times]
        out[cfg] = dict(times=[round(t, 3) for t in times],
                        best_fps=round(max(fps), 2),
                        median_fps=round(float(np.median(fps)), 2))
        print(f"[{cfg}] {out[cfg]}", flush=True)
        if cfg == "block":
            stats = mk_core("block")()
            stats.interact(masks[args.sessions + 1], 0)
            out["block_stats"] = blob_stats(stats)
            print(f"[block stats] {out['block_stats']}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
