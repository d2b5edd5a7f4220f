"""Fusion-trainer throughput on the real TPU.

The reference trains the fusion module at 384x384 crops, batch 12 on
2x11GB GPUs (reference README.md:164-172, hyper_para.py:23). This runs
the full jitted train step (frozen attention read -> FusionNet x2 heads
-> BootstrappedCE -> Adam update, train/trainer.py) on one chip over a
1-device mesh and reports steady-state steps/s and samples/s.

Inputs are re-seeded per step (no memoized repeats); each timed step
fetches the loss scalar (host sync).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_step_bench.py
"""
import json
import time

import numpy as np
import jax

from mivos_tpu.config import TrainConfig
from mivos_tpu.parallel.mesh import make_mesh
from mivos_tpu.train.trainer import FusionTrainer

B, H, W = 12, 384, 384


def make_batch(seed):
    rng = np.random.RandomState(seed)
    m = lambda: rng.rand(B, H, W, 1).astype(np.float32)
    return {
        "rgb": rng.randn(B, H, W, 3).astype(np.float32),
        "cls_gt": rng.randint(0, 3, (B, H, W)).astype(np.int32),
        "gt": (m() > 0.5).astype(np.float32),
        "seg1": m(), "seg2": m(),
        "src2_ref": m(), "src2_ref_gt": (m() > 0.5).astype(np.float32),
        "gt2": (m() > 0.5).astype(np.float32),
        "seg12": m(), "seg22": m(),
        "src2_ref2": m(), "src2_ref_gt2": (m() > 0.5).astype(np.float32),
        "src2_ref_im": rng.randn(B, H, W, 3).astype(np.float32),
        "dist": rng.rand(B, 2).astype(np.float32),
        "selector": np.ones((B, 2), np.float32),
    }


def main():
    print("devices:", jax.devices(), flush=True)
    mesh = make_mesh(1)
    trainer = FusionTrainer(TrainConfig(iterations=1000, steps=(800,),
                                        batch_size=B), mesh)
    trainer.init(make_batch(0))

    # Warmup: compile + first optimizer step.
    for s in range(2):
        losses = trainer.train_step(make_batch(1 + s))
        print(f"warmup {s}: loss {float(losses['total_loss']):.4f}",
              flush=True)

    # End-to-end with per-step host-generated batches (upload rides in
    # the step): the tunnel's ~30 MB/s upstream dominates at ~80 MB per
    # batch, so this mainly measures the link.
    n = 6
    t0 = time.time()
    for s in range(n):
        losses = trainer.train_step(make_batch(100 + s))
        loss = float(losses["total_loss"])   # host fetch every step
    e2e = n / (time.time() - t0)

    # Pure device step: DISTINCT batches pre-staged on device (repeats
    # of one batch would be memoized by the runtime), loss fetched each
    # step. This is the number a prefetching input pipeline
    # (data/loader.py) approaches.
    staged = [jax.device_put(make_batch(200 + s)) for s in range(n)]
    jax.block_until_ready(staged)
    trainer.train_step(staged[0])
    t0 = time.time()
    for s in range(n):
        losses = trainer.train_step(staged[s])
        loss = float(losses["total_loss"])
    dt = time.time() - t0
    assert np.isfinite(loss)
    print(json.dumps({
        "train_steps_per_s_device": round(n / dt, 2),
        "samples_per_s_device": round(n * B / dt, 1),
        "train_steps_per_s_hostfed": round(e2e, 2),
        "batch": B, "crop": [H, W], "last_loss": round(loss, 4)}))


if __name__ == "__main__":
    main()
