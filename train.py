"""Fusion-module training entry point.

Reference: train.py — NCCL DDP over 2 GPUs. Here: one jitted train step
data-parallel over a jax.sharding.Mesh; multi-host pods initialize via
jax.distributed (parallel/mesh.py). Stage 0 = BL30K, stage 1 = DAVIS
(reference util/hyper_para.py:46-53).

  python train.py --id retrain_s0 --stage 0 \
      --im_root ../BL30K/JPEGImages --gt_root ../BL30K/Annotations \
      --fd_root ../fusion_data/bl
"""
import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--id", default="NULL", help="run id (NULL = no log)")
    p.add_argument("--stage", type=int, default=0, help="0=BL30K, 1=DAVIS")
    p.add_argument("--im_root", required=True)
    p.add_argument("--gt_root", required=True)
    p.add_argument("--fd_root", required=True)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--steps", type=int, nargs="*", default=None)
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--load_prop", help="converted propagation checkpoint "
                   "(.pth) for the frozen attention reader")
    p.add_argument("--load_prop_npz", help="flax propagation weights "
                   "(.npz, e.g. scripts/pretrain_synthetic.py output) "
                   "for the frozen attention reader")
    p.add_argument("--load_network", help="weights-only resume (orbax)")
    p.add_argument("--load_model", help="full resume (orbax manager dir)")
    p.add_argument("--save_dir", default="saves")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--save_every", type=int, default=None,
                   help="checkpoint interval (default 5000)")
    p.add_argument("--report_every", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from mivos_tpu.checkpoint import (CheckpointManager, convert_attention_read,
                                      load_params, load_torch_state_dict,
                                      save_params)
    from mivos_tpu.config import TrainConfig
    from mivos_tpu.data import FusionDataset, Loader, ShardedSampler
    from mivos_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
    from mivos_tpu.train.trainer import FusionTrainer
    from mivos_tpu.utils import Integrator, TensorboardLogger

    maybe_initialize_distributed()
    extra = {}
    if args.save_every is not None:
        extra["save_every"] = args.save_every
    if args.report_every is not None:
        extra["report_every"] = args.report_every
    cfg = TrainConfig(stage=args.stage, batch_size=args.batch_size,
                      lr=args.lr, iterations=args.iterations,
                      steps=tuple(args.steps) if args.steps else None,
                      gamma=args.gamma, **extra)
    iterations = cfg.resolved_iterations()

    is_main = jax.process_index() == 0
    run_id = None if args.id == "NULL" else \
        f"{time.strftime('%b%d_%H.%M.%S')}_{args.id}"
    logger = TensorboardLogger(args.id, run_id if is_main else None)
    logger.log_string("hyperpara", str(vars(args)))

    mesh = make_mesh()
    trainer = FusionTrainer(cfg, mesh)

    dataset = FusionDataset(args.im_root, args.gt_root, args.fd_root,
                            seed=cfg.seed)
    sampler = ShardedSampler(len(dataset), num_shards=jax.process_count(),
                             shard=jax.process_index(), seed=cfg.seed)
    loader = Loader(dataset, cfg.batch_size // jax.process_count(),
                    sampler=sampler, num_workers=args.num_workers)

    first = next(iter(loader))
    first.pop("info", None)
    attn_params = None
    if args.load_prop:
        sd = load_torch_state_dict(args.load_prop)
        attn_params = convert_attention_read(sd)
    elif args.load_prop_npz:
        from mivos_tpu.checkpoint import attention_read_from_prop
        from mivos_tpu.checkpoint.npz import load_params_npz

        attn_params = attention_read_from_prop(
            load_params_npz(args.load_prop_npz))
    trainer.init(first, attn_params=attn_params)

    mgr = CheckpointManager(os.path.join(args.save_dir, args.id))
    if args.load_model:
        state = CheckpointManager(args.load_model).restore(
            template=trainer.state_dict())
        trainer.load_state_dict(state)
        print(f"resumed at iteration {trainer.it}")
    elif args.load_network:
        trainer.fuse_params = load_params(args.load_network,
                                          trainer.fuse_params)
        print("loaded network weights")

    integrator = Integrator(logger, distributed=True, is_main=is_main)
    integrator.add_hook(lambda v: (
        "iou", v.get("hide_iou/i", 0.0) / max(v.get("hide_iou/u", 1.0), 1.0)))

    epoch = trainer.it * cfg.batch_size // max(len(dataset), 1)
    last_report = time.time()
    try:
        while trainer.it < iterations:
            loader.set_epoch(epoch)
            for batch in loader:
                if trainer.it >= iterations:
                    break
                batch.pop("info", None)
                losses = trainer.train_step(batch)
                integrator.add_dict(
                    {k: float(np.asarray(v)) for k, v in losses.items()})
                it = trainer.it
                if it % cfg.report_every == 0 and it != 0:
                    logger.log_scalar(
                        "train/lr_it", it, it)
                    logger.log_scalar(
                        "train/time_per_iter",
                        (time.time() - last_report) / cfg.report_every, it)
                    last_report = time.time()
                    integrator.finalize("train", it)
                    integrator.reset_except_hooks()
                if is_main and it % (cfg.report_every * 10) == 0 and it:
                    # Training-pair montage (reference
                    # fusion_model.py:101-112).
                    from mivos_tpu.utils.image_saver import pool_fusion

                    out = trainer.debug_outputs(batch)
                    vis = dict(batch, mask=out["mask"],
                               attn1=out["attn1"], attn2=out["attn2"])
                    logger.log_cv2("train/pairs", pool_fusion(
                        {k: np.asarray(v) for k, v in vis.items()}), it)
                if is_main and it % cfg.save_every == 0 and it != 0:
                    mgr.save(it, trainer.state_dict())
            epoch += 1
    finally:
        # Save on exit if meaningfully trained (reference train.py:125-129).
        if is_main and trainer.it > 5000:
            mgr.save(trainer.it, trainer.state_dict())
            save_params(os.path.join(args.save_dir, args.id,
                                     f"final_{trainer.it}"),
                        trainer.fuse_params)


if __name__ == "__main__":
    main()
