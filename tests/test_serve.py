"""Serving layer: SessionManager semantics + the HTTP API end-to-end
(in-process ThreadingHTTPServer on an ephemeral port)."""
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.serve import SessionManager, make_server

T, H, W, K = 3, 48, 64, 2


@pytest.fixture(scope="module")
def net():
    prop = PropagationNetwork(top_k=10)
    f0 = jnp.zeros((H, W, 3))
    params = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, H, W, 1)), f0)
    return prop, params


@pytest.fixture(scope="module")
def manager(net):
    return SessionManager(*net, mem=MemoryConfig(top_k=10, mem_freq=2),
                          max_sessions=3)


def _fresh_manager(net, max_sessions=2):
    """Private manager for tests that mutate global state (shutdown,
    draining) — the shared module fixture must stay usable."""
    return SessionManager(*net, mem=MemoryConfig(top_k=10, mem_freq=2),
                          max_sessions=max_sessions)


def _video(seed=0):
    return (np.random.RandomState(seed).rand(T, H, W, 3)
            * 255).astype(np.uint8)


def _labels(seed=1):
    lab = np.zeros((H, W), np.uint8)
    lab[8:24, 8:28] = 1
    lab[28:44, 36:60] = 2
    return lab


class TestSessionManager:
    def test_create_interact_masks_close(self, manager):
        sid = manager.create(_video(), K)
        out = manager.interact(sid, _labels(), 0)
        assert out.shape == (T, H, W) and out.dtype == np.uint8
        assert out.max() <= K
        # Frame 0 keeps the interaction labels.
        assert (out[0] == _labels()).mean() > 0.99
        np.testing.assert_array_equal(manager.masks(sid), out)
        assert manager.close(sid) and not manager.close(sid)

    def test_bad_video_shape_rejected(self, manager):
        with pytest.raises(ValueError, match="T, H, W, 3"):
            manager.create(np.zeros((H, W, 3), np.uint8), 1)

    def test_warm_precompiles_and_cleans_up(self, manager):
        before = len(manager)
        dt = manager.warm(T, H, W, K)
        assert dt > 0 and len(manager) == before  # throwaway closed
        # Multi-round warm (absorbs bank bucket-crossing compiles)
        # interacts at distinct frames and still cleans up.
        dt = manager.warm(T, H, W, K, interactions=3)
        assert dt > 0 and len(manager) == before

    def test_metrics(self, manager):
        sid = manager.create(_video(9), K)
        manager.interact(sid, _labels(), 0)
        st = manager.stats()
        assert st["created"] >= 1 and st["interactions"] >= 1
        assert st["interact_p50_s"] is not None
        manager.close(sid)

    def test_lru_eviction(self, manager):
        sids = [manager.create(_video(s), 1) for s in range(4)]
        assert len(manager) <= 3
        with pytest.raises(KeyError):
            manager.interact(sids[0], _labels(), 0)  # evicted (oldest)
        assert manager.masks(sids[-1]).shape == (T, H, W)
        for s in sids[1:]:
            manager.close(s)


class TestCapacity:
    def test_hard_cap_times_out_when_all_busy(self, manager):
        """max_sessions is a hard HBM bound: when every session is
        mid-interaction (lock held, not evictable), create() waits and
        then raises CapacityError instead of overshooting."""
        from mivos_tpu.serve.server import CapacityError

        sids = [manager.create(_video(40 + i), 1) for i in range(3)]
        assert len(manager) == 3
        held = [manager._get(s).lock for s in sids]
        for lk in held:
            lk.acquire()  # simulate in-flight interactions
        try:
            with pytest.raises(CapacityError):
                manager.create(_video(50), 1, timeout=0.2)
            assert len(manager) == 3
        finally:
            for lk in held:
                lk.release()
        for s in sids:
            manager.close(s)

    def test_blocked_create_proceeds_when_room_frees(self, manager):
        """A create() waiting on capacity wakes up when a session
        closes (close/interact notify the capacity condition)."""
        sids = [manager.create(_video(60 + i), 1) for i in range(3)]
        held = [manager._get(s).lock for s in sids]
        for lk in held:
            lk.acquire()
        result = {}

        def blocked():
            result["sid"] = manager.create(_video(70), 1, timeout=10.0)

        th = threading.Thread(target=blocked)
        th.start()
        th.join(0.2)
        assert th.is_alive()  # genuinely blocked at capacity
        held[0].release()
        manager.close(sids[0])  # frees a slot + notifies
        th.join(10.0)
        assert not th.is_alive() and "sid" in result
        assert len(manager) <= manager.max_sessions
        for lk in held[1:]:
            lk.release()
        for s in sids[1:] + [result["sid"]]:
            manager.close(s)


class TestConcurrency:
    def test_hammer_mixed_ops(self, manager):
        """4 threads x mixed create/interact/masks/close against the
        shared manager: no exceptions besides the expected pressure
        outcomes — KeyError (LRU eviction) and CapacityError (every
        slot busy past the create timeout; on a loaded 1-core host slow
        interacts CAN hold all 3 slots long enough) — session count
        bounded, counters consistent."""
        import threading

        from mivos_tpu.serve.server import CapacityError

        errs = []
        created = []  # successful creates (thread-safe: list.append)

        def worker(seed):
            rng = np.random.RandomState(seed)
            try:
                for i in range(3):
                    try:
                        sid = manager.create(_video(seed * 10 + i), K)
                    except CapacityError:
                        continue  # all slots busy — expected pressure
                    created.append(sid)
                    try:
                        out = manager.interact(sid, _labels(), 0)
                        assert out.shape == (T, H, W)
                        assert manager.masks(sid).shape == (T, H, W)
                    except KeyError:
                        pass  # evicted under pressure — expected
                    if rng.rand() < 0.5:
                        manager.close(sid)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert len(manager) <= manager.max_sessions
        st = manager.stats()
        assert created, "no create ever succeeded"
        assert st["created"] >= len(created)


class TestEvictionRace:
    def test_evicted_session_marked_closed(self, net):
        """Eviction marks the victim closed UNDER its session lock, so
        a handler that already resolved the _Session can detect it."""
        mgr = _fresh_manager(net, max_sessions=1)
        sid_a = mgr.create(_video(20), 1)
        s_a = mgr._get(sid_a)
        mgr.create(_video(21), 1)  # evicts A (idle LRU)
        assert s_a.closed
        with pytest.raises(KeyError):
            mgr.interact(sid_a, _labels(), 0)

    def test_interact_resolved_before_eviction_404s(self, net,
                                                    monkeypatch):
        """The TOCTOU regression: an interact that resolved the session
        BEFORE eviction (passed _get, not yet holding the lock) must
        raise SessionNotFound when it finally acquires — never complete
        on a zombie session. Simulated by pinning _get to the stale
        pre-eviction _Session object."""
        from mivos_tpu.serve.server import SessionNotFound

        mgr = _fresh_manager(net, max_sessions=1)
        sid_a = mgr.create(_video(22), 1)
        stale = mgr._get(sid_a)          # handler resolves the session
        mgr.create(_video(23), 1)        # ...then eviction wins the lock
        monkeypatch.setattr(mgr, "_get", lambda sid: stale)
        with pytest.raises(SessionNotFound):
            mgr.interact(sid_a, _labels(), 0)
        with pytest.raises(SessionNotFound):
            mgr.masks(sid_a)

    def test_busy_session_never_evicted(self, net):
        """A session whose lock is held (mid-interaction) is not an
        eviction candidate; create() times out instead."""
        from mivos_tpu.serve.server import CapacityError

        mgr = _fresh_manager(net, max_sessions=1)
        sid = mgr.create(_video(24), 1)
        s = mgr._get(sid)
        s.lock.acquire()
        try:
            with pytest.raises(CapacityError):
                mgr.create(_video(25), 1, timeout=0.2)
            assert not s.closed and len(mgr) == 1
        finally:
            s.lock.release()


class TestShutdown:
    def test_drain_waits_for_inflight_interact(self, net):
        """shutdown() lets an in-flight interaction finish (the client
        gets its masks), refuses new work with CapacityError (HTTP
        503), then frees every session."""
        from mivos_tpu.serve.server import CapacityError

        mgr = _fresh_manager(net)
        sid = mgr.create(_video(30), K)
        s = mgr._get(sid)
        result = {}

        def run():
            result["out"] = mgr.interact(sid, _labels(), 0)

        th = threading.Thread(target=run)
        th.start()
        # Wait until the interaction actually holds the session lock.
        for _ in range(2000):
            if s.lock.locked():
                break
            import time
            time.sleep(0.005)
        assert mgr.shutdown(timeout=120.0)
        th.join(10.0)
        assert not th.is_alive()
        assert result["out"].shape == (T, H, W)  # in-flight completed
        assert len(mgr) == 0
        with pytest.raises(CapacityError):
            mgr.create(_video(31), 1, timeout=0.1)
        with pytest.raises(CapacityError):
            mgr.interact(sid, _labels(), 0)

    def test_shutdown_idle_manager(self, net):
        from mivos_tpu.serve.server import CapacityError

        mgr = _fresh_manager(net)
        mgr.create(_video(32), 1)
        assert mgr.shutdown(timeout=5.0)
        assert len(mgr) == 0
        with pytest.raises(CapacityError):
            mgr.create(_video(33), 1, timeout=0.1)


class TestProgress:
    def test_core_chunk_stream_matches_final(self, net):
        """InferenceCore.interact(chunk_cb=...) streams each scan
        chunk's decoded labels; streamed frames must equal the final
        authoritative masks at those frames."""
        from mivos_tpu.core.inference import InferenceCore
        from mivos_tpu.utils.tensor import labels_to_probs

        prop, params = net
        t = 12  # several tail chunks: multiple chunk_cb emissions
        video = (np.random.RandomState(3).rand(t, H, W, 3)
                 * 255).astype(np.uint8)
        core = InferenceCore(prop, params, None, None, video, K,
                             mem=MemoryConfig(top_k=10, mem_freq=2))
        got = []
        final = core.interact(labels_to_probs(_labels(), K), 0,
                              chunk_cb=lambda tis, labs:
                              got.append((list(tis), labs.copy())))
        assert got, "scan path must stream at least one chunk"
        seen = []
        for tis, labs in got:
            assert labs.shape == (len(tis), H, W)
            seen += tis
            for i, ti in enumerate(tis):
                np.testing.assert_array_equal(labs[i], final[ti])
        # Propagated (non-interacted) frames all streamed, in-order,
        # exactly once.
        assert sorted(seen) == list(range(1, t))

    def test_manager_progress_lifecycle(self, net):
        mgr = _fresh_manager(net)
        sid = mgr.create(_video(40), K)
        p = mgr.progress(sid)
        assert p["round"] == 0 and p["done"] and len(p["frames"]) == 0
        out = mgr.interact(sid, _labels(), 0)
        p = mgr.progress(sid)
        assert p["round"] == 1 and p["done"]
        np.testing.assert_array_equal(p["frames"], np.arange(T))
        np.testing.assert_array_equal(p["masks"], out)
        mgr.close(sid)

    def test_masks_nonblocking_while_busy(self, net):
        """GET /masks during an in-flight interact must answer
        immediately with the last COMPLETED round's snapshot instead of
        pinning the handler thread on the session lock for the pass
        duration. Simulated deterministically: hold the session lock
        (what a running interact does) and call masks() from a worker
        thread — it must return, with round-1's masks."""
        mgr = _fresh_manager(net)
        sid = mgr.create(_video(41), K)
        done = mgr.interact(sid, _labels(), 0)
        s = mgr._get(sid)
        s.lock.acquire()  # simulate a round in flight
        try:
            got = {}
            th = threading.Thread(
                target=lambda: got.update(masks=mgr.masks(sid)))
            th.start()
            th.join(10.0)
            assert not th.is_alive(), "masks() blocked on a busy session"
            np.testing.assert_array_equal(got["masks"], done)
        finally:
            s.lock.release()
        # Idle again: the authoritative (lock-held) path still serves.
        np.testing.assert_array_equal(mgr.masks(sid), done)
        mgr.close(sid)

    def test_progress_polls_during_interact(self, net):
        """Poll /progress semantics while a round is in flight: any
        mid-flight snapshot's streamed masks must already equal the
        final masks at those frames (the stream is authoritative
        per-chunk, not a preview that changes later)."""
        mgr = _fresh_manager(net)
        t = 12
        video = (np.random.RandomState(4).rand(t, H, W, 3)
                 * 255).astype(np.uint8)
        sid = mgr.create(video, K)
        snaps, result = [], {}

        def run():
            result["out"] = mgr.interact(sid, _labels(), 0)

        th = threading.Thread(target=run)
        th.start()
        import time
        while th.is_alive():
            snaps.append(mgr.progress(sid))
            time.sleep(0.01)
        th.join()
        final = result["out"]
        mid = [p for p in snaps if p["round"] == 1 and not p["done"]]
        for p in mid:
            for i, ti in enumerate(p["frames"]):
                np.testing.assert_array_equal(p["masks"][i], final[ti])
        p = mgr.progress(sid)
        assert p["done"] and len(p["frames"]) == t
        np.testing.assert_array_equal(p["masks"], final)
        mgr.close(sid)


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def base(self, manager):
        srv = make_server(manager, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        host, port = srv.server_address[:2]
        yield f"http://{host}:{port}"
        srv.shutdown()

    def _post(self, url, arrays):
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        req = urllib.request.Request(url, buf.getvalue(), method="POST")
        return urllib.request.urlopen(req)

    def test_full_roundtrip(self, base, manager):
        r = urllib.request.urlopen(base + "/healthz")
        assert json.load(r)["ok"]

        r = self._post(base + f"/v1/sessions?num_objects={K}",
                       {"video": _video(7)})
        sid = json.load(r)["session_id"]

        r = self._post(base + f"/v1/sessions/{sid}/interact",
                       {"labels": _labels(), "frame": np.int64(0)})
        masks = np.load(io.BytesIO(r.read()))["masks"]
        assert masks.shape == (T, H, W) and masks.max() <= K

        r = urllib.request.urlopen(base + f"/v1/sessions/{sid}/masks")
        np.testing.assert_array_equal(
            np.load(io.BytesIO(r.read()))["masks"], masks)

        req = urllib.request.Request(base + f"/v1/sessions/{sid}",
                                     method="DELETE")
        assert json.load(urllib.request.urlopen(req))["closed"]

    def test_progress_endpoint(self, base, manager):
        sid = manager.create(_video(8), K)
        out = manager.interact(sid, _labels(), 0)
        r = urllib.request.urlopen(base + f"/v1/sessions/{sid}/progress")
        z = np.load(io.BytesIO(r.read()))
        assert int(z["round"]) == 1 and int(z["done"]) == 1
        np.testing.assert_array_equal(z["frames"], np.arange(T))
        np.testing.assert_array_equal(z["masks"], out)
        manager.close(sid)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + f"/v1/sessions/{sid}/progress")
        assert e.value.code == 404

    def test_metrics_endpoint(self, base):
        st = json.load(urllib.request.urlopen(base + "/metrics"))
        assert {"sessions", "created", "interactions",
                "interact_p50_s"} <= set(st)

    def test_mp4_upload(self, base, manager):
        import os

        mp4 = os.path.join(os.path.dirname(__file__), os.pardir,
                           "examples", "example.mp4")
        if not os.path.exists(mp4):
            pytest.skip("example media not present")
        with open(mp4, "rb") as f:
            data = f.read()
        req = urllib.request.Request(
            base + "/v1/sessions?num_objects=1&format=mp4&min_side=64",
            data, method="POST")
        sid = json.load(urllib.request.urlopen(req))["session_id"]
        masks = manager.masks(sid)
        assert masks.ndim == 3 and min(masks.shape[1:]) == 64
        manager.close(sid)

    def test_missing_session_404(self, base):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + "/v1/sessions/00ff00ff/masks")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(base + "/v1/sessions/00ff00ff/interact",
                       {"labels": _labels(), "frame": np.int64(0)})
        assert e.value.code == 404

    def test_bad_request_bodies_get_400(self, base, manager):
        sid = manager.create(_video(11), K)
        # Missing npz key -> 400 (not 404: the session exists).
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(base + f"/v1/sessions/{sid}/interact",
                       {"labels": _labels()})
        assert e.value.code == 400
        # Wrong-shape labels -> 400 with the error message, not a dead
        # handler thread.
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(base + f"/v1/sessions/{sid}/interact",
                       {"labels": np.zeros((8, 8), np.uint8),
                        "frame": np.int64(0)})
        assert e.value.code == 400
        assert json.load(e.value)["error"]
        manager.close(sid)

    def test_masks_are_a_snapshot(self, manager):
        """masks()/interact() return copies — a later round must not
        mutate a response already handed to a client."""
        sid = manager.create(_video(12), K)
        out1 = manager.interact(sid, _labels(), 0)
        snap = out1.copy()
        inv = np.where(_labels() == 0, 1, 0).astype(np.uint8)
        manager.interact(sid, inv, T - 1)
        np.testing.assert_array_equal(out1, snap)
        manager.close(sid)
