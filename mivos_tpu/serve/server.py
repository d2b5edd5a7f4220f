"""Session manager + stdlib HTTP server for interactive VOS serving.

Design (TPU-first, no reference analog — the reference is a desktop
GUI, interactive_gui.py):

* One `SessionManager` owns all live sessions. Each session is pinned
  to a device round-robin at creation (`jax.default_device`, the same
  thread-local placement the fleet evaluator uses, eval/fleet.py), so
  concurrent requests for different sessions run on different chips
  while XLA executables are compiled once per device kind and shared.
* Per-session locks serialize interactions within a session (an
  InferenceCore mutates its bank); the registry lock is only held for
  bookkeeping, never across device work.
* Wire format: npz (zlib-compressed numpy archives). Label maps are
  piecewise constant, so savez_compressed ships them near the
  block-sparse rate without a custom decoder on the client.

HTTP API (serve.py at the repo root binds it):
  POST   /v1/sessions?num_objects=K   body: npz{video (T,H,W,3) uint8}
                                      -> {"session_id": ...}
         ...&format=mp4[&min_side=480]  body: raw container bytes,
                                      decoded via interactive/video_io
                                      (any cv2-readable format)
  POST   /v1/sessions/<id>/interact   body: npz{labels (h,w) uint8,
                                      frame []}  -> npz{masks (T,h,w)}
  GET    /v1/sessions/<id>/masks      -> npz{masks}
  DELETE /v1/sessions/<id>            -> {"closed": true}
  GET    /healthz                     -> {"ok": true, "sessions": N}
  GET    /metrics                     -> counters + interact latency
                                      percentiles (SessionManager.stats)

Status codes: 404 unknown/evicted session (typed SessionNotFound), 400
anything wrong inside a request body, 503 + Retry-After when the
manager is at max_sessions and no slot frees within the create timeout
(max_sessions is a HARD cap — it bounds per-chip HBM).
"""
from __future__ import annotations

import io
import json
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np

from mivos_tpu.config import MemoryConfig


class SessionNotFound(KeyError):
    """Unknown/evicted session id (HTTP 404)."""


class CapacityError(RuntimeError):
    """Manager at max_sessions and no room freed in time (HTTP 503)."""


class _Session:
    def __init__(self, core, device, num_objects: int):
        self.core = core
        self.device = device
        self.k = num_objects
        self.lock = threading.Lock()
        self.last_used = time.monotonic()


class SessionManager:
    """Live InferenceCore sessions keyed by id, pinned round-robin to
    devices; oldest-idle sessions are evicted at max_sessions."""

    def __init__(self, prop_net, prop_params, fuse_net=None,
                 fuse_params=None, mem: MemoryConfig = MemoryConfig(),
                 devices=None, max_sessions: int = 8):
        import jax

        self.prop_net, self.prop_params = prop_net, prop_params
        self.fuse_net, self.fuse_params = fuse_net, fuse_params
        self.mem = mem
        self.devices = list(devices if devices is not None
                            else jax.local_devices())
        self.max_sessions = max_sessions
        self._sessions: Dict[str, _Session] = {}
        self._lock = threading.Lock()
        # Signalled whenever room may have opened (a close, an eviction,
        # or an in-flight creation resolving) — create() waits on it.
        self._room = threading.Condition(self._lock)
        self._next_dev = 0
        # Observability counters (GET /metrics): lifetime totals + a
        # rolling window of interaction latencies for the percentiles.
        self._created = 0
        self._interactions = 0
        self._evicted = 0
        self._pending = 0  # creations in flight (reserve their slots)
        self._latencies: list = []  # rolling, capped at 512

    def warm(self, t: int, h: int, w: int, num_objects: int,
             interactions: int = 1) -> float:
        """Precompile the session executables for one video shape
        class: run a throwaway session (zeros video, `interactions`
        rounds) at (t, h, w, K). Executables are keyed by shape BUCKETS
        (time bucket, scan chunk, bank capacity), so any video in the
        same buckets then starts hot — on TPU VMs the persistent XLA
        compile cache extends this across server restarts. Bank
        capacity GROWS with rounds (each interaction memorizes more
        frames), so a 1-round warm leaves later rounds of real sessions
        paying bucket-crossing compiles; pass interactions≈the expected
        rounds per session to absorb those too. Returns seconds spent
        (the cold-start cost the first user would have paid)."""
        t0 = time.monotonic()
        video = np.zeros((t, h, w, 3), np.uint8)
        labels = np.zeros((h, w), np.uint8)
        for k in range(num_objects):  # a sliver of every object id
            labels[:, k::num_objects] = k + 1
        sid = self.create(video, num_objects)
        try:
            # Spread rounds over distinct frames: pass lengths (and so
            # chunk splits) differ per interaction frame, compiling the
            # same executables a real multi-round session hits.
            for i in range(max(1, interactions)):
                self.interact(sid, labels, (i * max(1, t // 3)) % t)
        finally:
            self.close(sid)
        return time.monotonic() - t0

    def create(self, video: np.ndarray, num_objects: int,
               timeout: float = 120.0) -> str:
        """video: (T, H, W, 3) uint8 (raw frames; normalized on device)
        or float32 (pre-normalized). Returns the session id.

        max_sessions is a HARD cap (it bounds per-chip HBM:
        device-resident video + bank per session). The slot is reserved
        BEFORE the slow session build; when eviction cannot make room
        (every session busy or slots held by in-flight creations), this
        waits up to `timeout` seconds for a close/eviction/creation to
        free one, then raises CapacityError (HTTP 503)."""
        import jax

        from mivos_tpu.core.inference import InferenceCore

        if video.ndim != 4 or video.shape[-1] != 3:
            raise ValueError(f"video must be (T, H, W, 3), got "
                             f"{video.shape}")
        deadline = time.monotonic() + timeout
        with self._room:
            self._pending += 1
            try:
                while True:
                    self._evict_locked(keep_room=self._pending)
                    if (len(self._sessions) + self._pending
                            <= self.max_sessions):
                        break
                    left = deadline - time.monotonic()
                    if left <= 0:
                        raise CapacityError(
                            f"at capacity ({self.max_sessions} sessions)")
                    self._room.wait(left)
            except BaseException:
                self._pending -= 1
                self._room.notify_all()
                raise
            dev = self.devices[self._next_dev % len(self.devices)]
            self._next_dev += 1
        try:
            with jax.default_device(dev):
                core = InferenceCore(self.prop_net, self.prop_params,
                                     self.fuse_net, self.fuse_params,
                                     video, num_objects, mem=self.mem)
            sid = uuid.uuid4().hex[:16]
            with self._lock:
                self._sessions[sid] = _Session(core, dev, num_objects)
                self._created += 1
        finally:
            with self._room:
                self._pending -= 1
                self._room.notify_all()
        return sid

    def interact(self, sid: str, labels: np.ndarray,
                 frame_idx: int) -> np.ndarray:
        """labels: (h, w) uint8 map (0 = background, 1..K = objects) for
        frame_idx. Propagates and returns all (T, h, w) labels."""
        import jax

        from mivos_tpu.utils.tensor import labels_to_probs

        s = self._get(sid)
        # Touch last_used BEFORE the (possibly minutes-long cold
        # compile) interaction so an active session is not the LRU
        # eviction victim mid-flight.
        s.last_used = t0 = time.monotonic()
        with s.lock, jax.default_device(s.device):
            mask = labels_to_probs(np.asarray(labels), s.k)
            out = s.core.interact(mask, int(frame_idx)).copy()
        s.last_used = time.monotonic()
        with self._room:
            self._interactions += 1
            self._latencies.append(s.last_used - t0)
            del self._latencies[:-512]
            # The session is idle again, i.e. evictable — wake any
            # create() blocked on capacity.
            self._room.notify_all()
        return out

    def masks(self, sid: str) -> np.ndarray:
        s = self._get(sid)
        with s.lock:
            s.last_used = time.monotonic()
            # Copy under the lock: np_masks is the session's live
            # buffer, mutated in place by the next interact — returning
            # it raw would let a concurrent round tear the response.
            return s.core.np_masks.copy()

    def close(self, sid: str) -> bool:
        with self._room:
            closed = self._sessions.pop(sid, None) is not None
            if closed:
                self._room.notify_all()
            return closed

    def __len__(self) -> int:
        with self._lock:
            return len(self._sessions)

    def _get(self, sid: str) -> _Session:
        with self._lock:
            s = self._sessions.get(sid)
            if s is None:
                raise SessionNotFound(sid)
            return s

    def _evict_locked(self, keep_room: int) -> None:
        while len(self._sessions) > self.max_sessions - keep_room:
            # Never evict a session that is mid-interaction (lock held).
            idle = [k for k, s in self._sessions.items()
                    if not s.lock.locked()]
            if not idle:
                return  # everyone is busy; allow transient overshoot
            oldest = min(idle, key=lambda k: self._sessions[k].last_used)
            del self._sessions[oldest]
            self._evicted += 1

    def stats(self) -> Dict:
        with self._lock:
            import math

            lat = sorted(self._latencies)
            # Nearest-rank percentile: ceil(p*n) - 1.
            pct = (lambda p: round(lat[max(0, math.ceil(p * len(lat))
                                           - 1)], 3)) \
                if lat else (lambda p: None)
            return {"sessions": len(self._sessions),
                    "created": self._created,
                    "interactions": self._interactions,
                    "evicted": self._evicted,
                    "devices": len(self.devices),
                    "interact_p50_s": pct(0.50),
                    "interact_p95_s": pct(0.95)}


def _npz(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def _unnpz(data: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(data)) as z:
        return {k: z[k] for k in z.files}


class VOSRequestHandler(BaseHTTPRequestHandler):
    """Routes the HTTP API onto a SessionManager (set as the server's
    `manager` attribute by make_server)."""

    _SESSION = re.compile(r"^/v1/sessions/([0-9a-f]+)/?(masks|interact)?$")

    # --- helpers -----------------------------------------------------
    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self._raw(code, body, "application/json")

    def _raw(self, code: int, body: bytes,
             ctype: str = "application/octet-stream") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def log_message(self, fmt, *a):  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *a)

    @property
    def manager(self) -> SessionManager:
        return self.server.manager  # type: ignore[attr-defined]

    # --- routes ------------------------------------------------------
    def do_GET(self):
        if self.path == "/healthz":
            return self._json(200, {"ok": True,
                                    "sessions": len(self.manager)})
        if self.path == "/metrics":
            return self._json(200, self.manager.stats())
        m = self._SESSION.match(self.path)
        if m and m.group(2) == "masks":
            try:
                masks = self.manager.masks(m.group(1))
            except SessionNotFound:
                return self._json(404, {"error": "no such session"})
            return self._raw(200, _npz({"masks": masks}))
        self._json(404, {"error": "unknown route"})

    def do_POST(self):
        if self.path.startswith("/v1/sessions?") or \
                self.path == "/v1/sessions":
            return self._guard400(self._create_session)
        m = self._SESSION.match(self.path)
        if m and m.group(2) == "interact":
            sid = m.group(1)
            try:
                self.manager._get(sid)  # 404 before parsing the body
            except SessionNotFound:
                return self._json(404, {"error": "no such session"})
            return self._guard400(lambda: self._interact(sid))
        self._json(404, {"error": "unknown route"})

    def _guard400(self, fn) -> None:
        """Map manager exceptions to status codes. SessionNotFound (the
        id vanished, e.g. evicted between route check and run) -> 404;
        CapacityError -> 503 + Retry-After; anything else raised inside
        a request body is the CLIENT's error (bad npz keys, shape
        mismatches, out-of-range frames, undecodable video...) — answer
        400 with the message rather than letting the exception kill the
        handler thread with no response (jax shape errors are TypeError,
        not ValueError)."""
        try:
            fn()
        except SessionNotFound:
            self._json(404, {"error": "no such session"})
        except CapacityError as e:
            self.send_response(503)
            body = json.dumps({"error": str(e)}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Retry-After", "5")
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:  # noqa: BLE001 — see docstring
            self._json(400, {"error": f"{type(e).__name__}: {e}"})

    def _create_session(self) -> None:
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        k = int(q.get("num_objects", ["1"])[0])
        fmt = q.get("format", ["npz"])[0]
        if fmt == "npz":
            video = _unnpz(self._body())["video"]
        else:  # raw container bytes (mp4/avi/...): cv2 decode
            import tempfile

            from mivos_tpu.interactive.video_io import load_video

            min_side = int(q.get("min_side", ["480"])[0])
            with tempfile.NamedTemporaryFile(suffix=f".{fmt}") as tmp:
                tmp.write(self._body())
                tmp.flush()
                video = load_video(tmp.name, min_side=min_side)
        sid = self.manager.create(video, k)
        self._json(200, {"session_id": sid})

    def _interact(self, sid: str) -> None:
        data = _unnpz(self._body())
        # SessionNotFound (evicted between route check and run) -> 404
        # and a missing npz key (plain KeyError) -> 400, both via
        # _guard400's typed mapping.
        masks = self.manager.interact(sid, data["labels"],
                                      int(data["frame"]))
        self._raw(200, _npz({"masks": masks}))

    def do_DELETE(self):
        m = self._SESSION.match(self.path)
        if m and not m.group(2):
            return self._json(200, {"closed":
                                    self.manager.close(m.group(1))})
        self._json(404, {"error": "unknown route"})


def make_server(manager: SessionManager, host: str = "127.0.0.1",
                port: int = 0, verbose: bool = False) -> ThreadingHTTPServer:
    """Bind (but do not start) the HTTP server; port 0 picks a free
    port (server.server_address reports it). Call serve_forever() or
    run it in a thread."""
    srv = ThreadingHTTPServer((host, port), VOSRequestHandler)
    srv.manager = manager  # type: ignore[attr-defined]
    srv.verbose = verbose  # type: ignore[attr-defined]
    return srv
