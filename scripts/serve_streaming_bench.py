"""On-chip latency of progressive mask streaming (VERDICT r3 item 5).

Measures, on the real TPU, how soon a client sees FIRST masks from a
long interact via `GET /v1/sessions/<id>/progress` versus waiting for
the full pass — the serving analog of the reference GUI's per-frame
progress callback (reference interactive_gui.py:530-540), which the
HTTP surface gained in round 4 (serve/server.py::SessionManager.progress).

Protocol (timing rules per .claude/skills/verify/SKILL.md):
  1. `warm(T, H, W, K, interactions=2)` absorbs the remote compiles.
  2. One 300-frame 480p session; two interact rounds (distinct labels
     and frames so nothing is memoized). Each round: interact() runs
     in a thread while the main thread polls progress() every 25 ms,
     recording when each new chunk's frames become host-visible.
  3. During round 2 one `GET /progress` round-trip is timed through a
     real ThreadingHTTPServer to include npz serialization.

Reports one JSON line: per-round time-to-first-masks, chunk arrival
spans, full-round wall, and the HTTP poll round-trip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/serve_streaming_bench.py
"""
import io
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.serve import SessionManager, make_server

T, H, W, K = 300, 480, 854, 2


def _labels(seed):
    r = np.random.RandomState(seed)
    return r.randint(0, K + 1, (H, W)).astype(np.uint8)


def timed_round(mgr, sid, labels, frame):
    """Run one interact in a thread; poll progress() until done.
    Returns (t_first, arrivals[(t_rel, n_frames)], wall)."""
    t0 = time.monotonic()
    out = {}

    def run():
        out["masks"] = mgr.interact(sid, labels, frame)

    th = threading.Thread(target=run)
    th.start()
    arrivals, seen = [], 0
    while th.is_alive():
        p = mgr.progress(sid)
        n = len(p["frames"])
        if n > seen and not p["done"]:
            arrivals.append((round(time.monotonic() - t0, 3), n))
            seen = n
        # 25 ms poll cadence: a busy loop would contend the GIL with
        # the interact thread being measured and bias the timings.
        time.sleep(0.025)
    th.join()
    wall = time.monotonic() - t0
    assert out["masks"].shape == (T, H, W)
    return arrivals, round(wall, 3)


def main():
    print("devices:", jax.devices(), flush=True)
    prop = PropagationNetwork(top_k=50, dtype="bfloat16",
                              read_backend="pallas")
    f0 = jnp.zeros((128, 160, 3))
    params = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, 128, 160, 1)), f0)
    mgr = SessionManager(prop, params, mem=MemoryConfig(top_k=50),
                         max_sessions=2)
    t0 = time.monotonic()
    warm_s = mgr.warm(T, H, W, K, interactions=2)
    print(f"warm: {warm_s:.1f}s", flush=True)

    video = (np.random.RandomState(7).rand(T, H, W, 3)
             * 255).astype(np.uint8)
    t0 = time.monotonic()
    sid = mgr.create(video, K)
    create_s = round(time.monotonic() - t0, 2)
    print(f"create (incl. {video.nbytes >> 20} MB video upload): "
          f"{create_s}s", flush=True)

    rounds = []
    for i, frame in enumerate([0, T - 1]):
        arrivals, wall = timed_round(mgr, sid, _labels(10 + i), frame)
        rounds.append({"frame": frame, "wall_s": wall,
                       "t_first_masks_s": arrivals[0][0] if arrivals
                       else None,
                       "arrivals": arrivals})
        print(f"round {i}: first masks at "
              f"{arrivals[0] if arrivals else '-'}, wall {wall}s, "
              f"{len(arrivals)} chunk arrivals", flush=True)

    # One HTTP GET /progress round-trip while a third round runs, so
    # the npz serialization cost of a partial snapshot is included.
    srv = make_server(mgr, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    http_rtt, out = [], {}

    def run():
        out["m"] = mgr.interact(sid, _labels(12), T // 2)

    th = threading.Thread(target=run)
    th.start()
    url = f"http://127.0.0.1:{port}/v1/sessions/{sid}/progress"
    while th.is_alive():
        t1 = time.monotonic()
        r = urllib.request.urlopen(url)
        body = r.read()
        d = np.load(io.BytesIO(body))
        if len(d["frames"]) and not bool(d["done"]):
            http_rtt.append({"rtt_s": round(time.monotonic() - t1, 3),
                             "frames": int(len(d["frames"])),
                             "npz_bytes": len(body)})
        time.sleep(0.05)
    th.join()
    srv.shutdown()
    mgr.close(sid)

    print(json.dumps({
        "frames": T, "hw": [H, W], "objects": K,
        "warm_s": round(warm_s, 1), "create_s": create_s,
        "rounds": rounds,
        "http_progress_samples": http_rtt[:5],
    }))


if __name__ == "__main__":
    main()
