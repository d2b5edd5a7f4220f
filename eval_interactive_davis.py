"""DAVIS 2017 interactive evaluation entry point (reference:
eval_interactive_davis.py). Requires the `davisinteractive` package and
the converted MiVOS checkpoints.

  python eval_interactive_davis.py --davis ../DAVIS/2017 --output out \
      --prop_model saves/propagation_model.pth \
      --fusion_model saves/fusion.pth --s2m_model saves/s2m.pth
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prop_model", default="saves/propagation_model.pth")
    p.add_argument("--fusion_model", default="saves/fusion.pth")
    p.add_argument("--s2m_model", default="saves/s2m.pth")
    p.add_argument("--davis", default="../DAVIS/2017")
    p.add_argument("--output", required=True)
    p.add_argument("--save_mask", action="store_true")
    p.add_argument("--mem_freq", type=int, default=5)
    p.add_argument("--top_k", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16",
                   help="conv-tower compute dtype (bfloat16|float32)")
    p.add_argument("--read_backend", default="auto",
                   help="memory-read backend: auto|pallas|xla_approx|"
                        "xla_exact (see ops/memory_read.py)")
    p.add_argument("--bank_sharded", action="store_true",
                   help="shard each session's memory bank position axis "
                        "over all chips (long videos; MemoryConfig."
                        "bank_sharded)")
    p.add_argument("--object_shards", type=int, default=0,
                   help="shard the object axis over this many chips "
                        "(per-frame latency scaling; sequences whose "
                        "object count is not divisible run unsharded). "
                        "Composes with --bank_sharded on a 2D mesh.")
    p.add_argument("--fleet", action="store_true",
                   help="fan sequences across all chips, one full "
                        "session per sequence per chip (implies "
                        "--local_robot; exclusive with the sharded "
                        "session flags)")
    p.add_argument("--local_robot", action="store_true",
                   help="use the in-repo scribble robot/session "
                        "(eval/robot.py) instead of the davisinteractive "
                        "package; auto-selected when the package is "
                        "missing. Scores are internally consistent but "
                        "not comparable to official AUC-J&F.")
    args = p.parse_args()

    import jax

    from mivos_tpu.checkpoint import (convert_fusion_net, convert_prop_net,
                                      convert_s2m, load_torch_state_dict)
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.eval.davis_interactive import (
        run_davis_interactive, run_local_interactive_davis)
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.models.s2m import S2MNetwork as S2M

    dtype = None if args.dtype == "float32" else args.dtype
    # top_k flows through MemoryConfig only (the single source of truth
    # for read knobs); InferenceCore applies it to the network.
    prop_net = PropagationNetwork(dtype=dtype,
                                  read_backend=args.read_backend)
    prop_params = convert_prop_net(load_torch_state_dict(args.prop_model))
    fuse_net = FusionNet(dtype=dtype)
    fuse_params = convert_fusion_net(load_torch_state_dict(args.fusion_model))
    s2m_net = S2M(dtype=dtype)
    s2m_params = convert_s2m(load_torch_state_dict(args.s2m_model))

    use_local = args.local_robot
    if not use_local:
        try:
            import davisinteractive  # noqa: F401
        except ImportError:
            print("davisinteractive not installed; falling back to the "
                  "in-repo robot (--local_robot).")
            use_local = True

    mem = MemoryConfig(top_k=args.top_k, mem_freq=args.mem_freq,
                       bank_sharded=args.bank_sharded,
                       object_sharded=args.object_shards > 0)
    mesh = None
    if args.object_shards > 0 and args.bank_sharded:
        from mivos_tpu.parallel.mesh import make_mesh_nd

        nd = len(jax.devices())
        if nd % args.object_shards or nd < args.object_shards:
            raise SystemExit(
                f"--object_shards {args.object_shards} must divide the "
                f"device count ({nd}) when combined with --bank_sharded")
        mesh = make_mesh_nd(object=args.object_shards,
                            data=nd // args.object_shards)
    elif args.object_shards > 0:
        from mivos_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.object_shards, axis="object")
    elif args.bank_sharded:
        from mivos_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(len(jax.devices()))
    if args.fleet:
        if mesh is not None:
            raise SystemExit("--fleet is exclusive with --bank_sharded/"
                             "--object_shards (one session per chip)")
        summary = run_local_interactive_davis(
            prop_net, prop_params, fuse_net, fuse_params, s2m_net,
            s2m_params, davis_root=args.davis, mem=mem,
            out_path=args.output, save_mask=args.save_mask, fleet=True)
    elif use_local:
        summary = run_local_interactive_davis(
            prop_net, prop_params, fuse_net, fuse_params, s2m_net,
            s2m_params, davis_root=args.davis, mem=mem,
            out_path=args.output, save_mask=args.save_mask, mesh=mesh)
    else:
        summary = run_davis_interactive(
            prop_net, prop_params, fuse_net, fuse_params, s2m_net,
            s2m_params, davis_root=args.davis, out_path=args.output,
            save_mask=args.save_mask, mem=mem, mesh=mesh)
    print(summary)


if __name__ == "__main__":
    main()
