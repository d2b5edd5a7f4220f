"""Fleet-parallel inference: many videos across many chips.

The reference is strictly single-GPU at inference time
(inference_core.py:36 `device='cuda:0'`); evaluation walks sequences
serially. On TPU, interactive VOS evaluation is embarrassingly parallel
ACROSS videos — one session per video per chip — so the TPU-native
answer to "multi-GPU inference" (SURVEY.md section 2.8) is a fleet
scheduler, not model parallelism: each worker thread pins a device via
jax.default_device (thread-local config) and runs a whole session on
it; XLA executables are compiled once per device kind and shared.

Threads, not processes: JAX dispatch is thread-safe and sessions are
I/O-bound on dispatch latency, so a thread per device keeps every chip
busy without duplicating weights in host memory.
"""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore


def fleet_map(fn: Callable, items: Sequence,
              devices: Optional[List] = None,
              workers_per_device: int = 1) -> List:
    """Run fn(item) for every item, fanning items over devices. Each
    worker thread OWNS one device and pulls items from a shared queue
    (work stealing), so a slow video never queues two sessions onto one
    chip while others idle — two concurrent sessions' device-resident
    frames + query caches would contend for (or exhaust) its HBM.
    fn executes with the worker's device as the JAX default, so all
    arrays it creates (and every jit dispatch) land there."""
    devices = list(devices if devices is not None else jax.local_devices())
    results = [None] * len(items)
    errors: List = []
    next_item = iter(range(len(items)))
    lock = threading.Lock()

    def worker(dev) -> None:
        while True:
            with lock:
                i = next(next_item, None)
            if i is None:
                return
            try:
                with jax.default_device(dev):
                    results[i] = fn(items[i])
            except Exception as e:  # surface after the pool drains
                errors.append((i, e))

    lanes = [dev for dev in devices for _ in range(workers_per_device)]
    if len(items) <= 1 or len(lanes) <= 1:
        worker(lanes[0] if lanes else None)
    else:
        with ThreadPoolExecutor(max_workers=len(lanes)) as ex:
            list(ex.map(worker, lanes))
    if errors:
        i, e = errors[0]
        raise RuntimeError(f"fleet item {i} failed: {e!r}") from e
    return results


def propagate_videos(prop_net, prop_params, fuse_net, fuse_params,
                     videos: Sequence, masks: Sequence,
                     frame_idxs: Optional[Sequence[int]] = None,
                     num_objects: Optional[Sequence[int]] = None,
                     mem: MemoryConfig = MemoryConfig(),
                     devices: Optional[List] = None) -> List[np.ndarray]:
    """Propagate a first-mask through each video, videos fanned out
    across the local devices. videos[i]: (T, H, W, 3); masks[i]:
    (K+1, H, W, 1) probabilities. Returns per-video (T, H, W) labels."""
    if frame_idxs is None:
        frame_idxs = [0] * len(videos)
    if num_objects is None:
        num_objects = [m.shape[0] - 1 for m in masks]

    def run(i: int) -> np.ndarray:
        core = InferenceCore(prop_net, prop_params, fuse_net, fuse_params,
                             videos[i], num_objects[i], mem=mem)
        return core.interact(masks[i], frame_idxs[i]).copy()

    return fleet_map(run, list(range(len(videos))), devices=devices)
