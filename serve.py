"""HTTP serving entry point: interactive VOS sessions over the wire.

The reference deploys as a desktop GUI only; this serves the same
propagation engine to remote clients — create a session per video,
send label-map interactions, download propagated masks (API doc:
mivos_tpu/serve/server.py). Sessions are pinned round-robin across the
host's chips.

  python serve.py --prop_model saves/propagation_model.pth \
      --fusion_model saves/fusion.pth --port 8080

Client sketch:
  import io, numpy as np, urllib.request
  buf = io.BytesIO(); np.savez_compressed(buf, video=video_uint8)
  r = urllib.request.urlopen(urllib.request.Request(
      f"{base}/v1/sessions?num_objects=2", buf.getvalue(), method="POST"))
  sid = json.load(r)["session_id"]
  buf = io.BytesIO(); np.savez_compressed(buf, labels=lab, frame=0)
  r = urllib.request.urlopen(urllib.request.Request(
      f"{base}/v1/sessions/{sid}/interact", buf.getvalue(), method="POST"))
  masks = np.load(io.BytesIO(r.read()))["masks"]
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prop_model", default="saves/propagation_model.pth")
    p.add_argument("--fusion_model", default="saves/fusion.pth")
    p.add_argument("--no_fusion", action="store_true",
                   help="serve propagation only (skip the fusion net)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--top_k", type=int, default=50)
    p.add_argument("--mem_freq", type=int, default=5)
    p.add_argument("--max_sessions", type=int, default=8)
    p.add_argument("--create_timeout", type=float, default=5.0,
                   help="seconds an HTTP create waits at capacity "
                        "before 503 (each queued create pins a handler "
                        "thread — keep this short)")
    p.add_argument("--drain_timeout", type=float, default=30.0,
                   help="graceful-shutdown budget: seconds to wait for "
                        "in-flight interactions on SIGINT/SIGTERM")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--warm", default=None, metavar="T,H,W,K",
                   help="precompile the session executables for this "
                        "video shape class before binding the port "
                        "(e.g. 100,480,854,3) — the first user then "
                        "skips the cold-compile stall")
    p.add_argument("--warm_rounds", type=int, default=1,
                   help="interactions per warm session: bank capacity "
                        "buckets grow with rounds, so warming ~the "
                        "expected rounds/session also absorbs the "
                        "bucket-crossing compiles of later rounds")
    args = p.parse_args()

    from mivos_tpu.checkpoint import (convert_fusion_net, convert_prop_net,
                                      load_torch_state_dict)
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.serve import (SessionManager, make_server,
                                 shutdown_gracefully)

    dtype = None if args.dtype == "float32" else args.dtype
    prop_net = PropagationNetwork(dtype=dtype)
    prop_params = convert_prop_net(load_torch_state_dict(args.prop_model))
    fuse_net = fuse_params = None
    if not args.no_fusion:
        fuse_net = FusionNet(dtype=dtype)
        fuse_params = convert_fusion_net(
            load_torch_state_dict(args.fusion_model))

    mgr = SessionManager(prop_net, prop_params, fuse_net, fuse_params,
                         mem=MemoryConfig(top_k=args.top_k,
                                          mem_freq=args.mem_freq),
                         max_sessions=args.max_sessions)
    if args.warm:
        t, h, w, k = (int(x) for x in args.warm.split(","))
        print(f"warming executables for (T={t}, {h}x{w}, K={k})...",
              flush=True)
        dt = mgr.warm(t, h, w, k, interactions=args.warm_rounds)
        print(f"warm done in {dt:.1f}s")

    srv = make_server(mgr, host=args.host, port=args.port, verbose=True,
                      create_timeout=args.create_timeout)
    print(f"serving on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]} ({len(mgr.devices)} device(s))")
    import signal
    import threading

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    stop.wait()
    # Graceful drain: stop accepting, let in-flight interactions
    # finish (up to --drain_timeout), free sessions, close the socket.
    print("draining...", flush=True)
    drained = shutdown_gracefully(srv, timeout=args.drain_timeout)
    print(f"shutdown complete (drained={drained})")


if __name__ == "__main__":
    main()
