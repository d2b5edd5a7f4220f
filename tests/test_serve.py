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
def manager():
    prop = PropagationNetwork(top_k=10)
    f0 = jnp.zeros((H, W, 3))
    params = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, H, W, 1)), f0)
    return SessionManager(prop, params,
                          mem=MemoryConfig(top_k=10, mem_freq=2),
                          max_sessions=3)


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
        shared manager: no exceptions besides expected KeyErrors (LRU
        eviction under pressure), session count bounded, counters
        consistent."""
        import threading

        errs = []

        def worker(seed):
            rng = np.random.RandomState(seed)
            try:
                for i in range(3):
                    sid = manager.create(_video(seed * 10 + i), K)
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
        assert st["created"] >= 12


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
