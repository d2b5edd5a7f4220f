"""Object-axis (K) sharded inference on the virtual CPU mesh.

MemoryConfig.object_sharded splits each propagated frame's K-batched
heavy phases (per-object memory read + decoder + memorize — the
dominant FLOPs, see PERF.md's MFU table) across the mesh's object axis
via GSPMD sharding constraints (models/propagation.py::_obj). The
sharded session must match the single-device session; the reference has
no distributed inference at all (reference inference_core.py:36).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.parallel.mesh import make_mesh

TS, RH, RW = 8, 45, 62


def _net(k):
    prop = PropagationNetwork(top_k=10, read_backend="xla_exact")
    frame = jnp.zeros((48, 64, 3))
    masks = jnp.zeros((k, 48, 64, 1))
    params = prop.init(jax.random.PRNGKey(0), frame, masks, frame)
    images = np.random.RandomState(0).rand(TS, RH, RW, 3).astype(np.float32)
    return prop, params, images


def _mask(seed, k):
    from mivos_tpu.utils.tensor import one_hot_mask

    rng = np.random.RandomState(seed)
    labels = jnp.asarray(rng.randint(0, k + 1, (RH, RW)))
    fg = one_hot_mask(labels, k)
    bg = 1.0 - fg.sum(0, keepdims=True)
    return jnp.concatenate([bg, fg], axis=0)


def _assert_sessions_match(ref, sh, outs):
    for out_sh, out_ref in outs:
        assert (out_sh == out_ref).mean() > 0.999
    for ti in range(TS):
        np.testing.assert_allclose(np.asarray(sh.get_prob(ti)),
                                   np.asarray(ref.get_prob(ti)), atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
class TestObjectShardedSession:
    def test_multiround_matches_single_device(self):
        k = 2
        prop, params, images = _net(k)
        mesh = make_mesh(2, axis="object")
        mem = MemoryConfig(top_k=10, mem_freq=2)
        ref = InferenceCore(prop, params, None, None, images, k, mem=mem)
        sh = InferenceCore(
            prop, params, None, None, images, k,
            mem=MemoryConfig(top_k=10, mem_freq=2, object_sharded=True),
            mesh=mesh)
        assert sh.prop_net.object_mesh is mesh
        m1, m2 = _mask(1, k), _mask(2, k)
        o_ref1 = ref.interact(m1, idx=0).copy()
        o_sh1 = sh.interact(m1, idx=0).copy()
        o_ref2 = ref.interact(m2, idx=TS - 1).copy()
        o_sh2 = sh.interact(m2, idx=TS - 1).copy()
        _assert_sessions_match(ref, sh, [(o_sh1, o_ref1), (o_sh2, o_ref2)])
        # The bank carry really is object-sharded across the mesh.
        assert len(sh.bank.keys.sharding.device_set) == 2

    def test_k_three_objects_three_devices(self):
        """K=3 over a 3-device object axis (axis size must divide K)."""
        k = 3
        prop, params, images = _net(k)
        mesh = make_mesh(3, axis="object")
        ref = InferenceCore(prop, params, None, None, images, k,
                            mem=MemoryConfig(top_k=10, mem_freq=2))
        sh = InferenceCore(
            prop, params, None, None, images, k,
            mem=MemoryConfig(top_k=10, mem_freq=2, object_sharded=True),
            mesh=mesh)
        m = _mask(3, k)
        o_ref = ref.interact(m, idx=2).copy()
        o_sh = sh.interact(m, idx=2).copy()
        _assert_sessions_match(ref, sh, [(o_sh, o_ref)])

    def test_fused_session_matches(self):
        """Difference-aware fusion active: the K-batched attention read
        and FusionNet run under the object constraint too."""
        from mivos_tpu.models.fusion import FusionNet

        k = 2
        prop, params, images = _net(k)
        fuse = FusionNet()
        fp = fuse.init(jax.random.PRNGKey(1),
                       jnp.zeros((k, 48, 64, 3)), jnp.zeros((k, 48, 64, 1)),
                       jnp.zeros((k, 48, 64, 1)), jnp.zeros((k, 48, 64, 2)),
                       jnp.zeros((k, 2)))
        mesh = make_mesh(2, axis="object")
        ref = InferenceCore(prop, params, fuse, fp, images, k,
                            mem=MemoryConfig(top_k=10, mem_freq=2))
        sh = InferenceCore(
            prop, params, fuse, fp, images, k,
            mem=MemoryConfig(top_k=10, mem_freq=2, object_sharded=True),
            mesh=mesh)
        ref.interact(_mask(5, k), idx=0)
        sh.interact(_mask(5, k), idx=0)
        o_ref = ref.interact(_mask(6, k), idx=TS - 1)
        o_sh = sh.interact(_mask(6, k), idx=TS - 1)
        _assert_sessions_match(ref, sh, [(o_sh, o_ref)])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestObjectShardedRead:
    """The per-object manual read (shard_map over K) that keeps the
    fused Pallas kernel usable under object sharding."""

    def _bank(self, k=2, m=512, n=96):
        rng = np.random.RandomState(11)
        mk = jnp.asarray(rng.randn(k, m, 128).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, 256).astype(np.float32))
        q = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        valid = jnp.arange(m) < m - 40
        return mk, mv, q, valid

    def test_matches_exact_read(self):
        from mivos_tpu.ops.memory_read import memory_read
        from mivos_tpu.parallel.sharded_memory import (
            object_sharded_memory_read)

        mk, mv, q, valid = self._bank()
        ref = memory_read(mk, mv, q, top_k=20, valid=valid,
                          backend="xla_exact")
        out = object_sharded_memory_read(
            make_mesh(2, axis="object"), mk, mv, q, top_k=20, valid=valid,
            backend="xla_exact")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_pallas_interpret_inside_shard_map(self):
        """The Pallas kernel composes with the per-object shard_map
        (interpret mode on CPU; the Mosaic path is the same call)."""
        from mivos_tpu.ops.memory_read import memory_read
        from mivos_tpu.ops.pallas.memory_read import memory_read_pallas
        from jax.sharding import PartitionSpec as P

        mk, mv, q, valid = self._bank(m=1024, n=128)
        ref = memory_read(mk, mv, q, top_k=20, valid=valid,
                          backend="xla_exact")
        mesh = make_mesh(2, axis="object")

        def local(a, b, c, d):
            return memory_read_pallas(a, b, c, top_k=20, valid=d,
                                      interpret=True)

        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("object"), P("object"), P(), P()),
            out_specs=P("object"), check_vma=False)(mk, mv, q, valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestObjectBank2D:
    """object_sharded + bank_sharded compose on a 2D mesh: each device
    owns its objects' slice of the bank, the exact-top-k read/write
    collectives run over the position axis only."""

    def test_2d_read_matches_exact(self):
        from mivos_tpu.ops.memory_read import memory_read
        from mivos_tpu.parallel.mesh import make_mesh_nd
        from mivos_tpu.parallel.sharded_memory import (shard_bank,
                                                       sharded_memory_read)

        rng = np.random.RandomState(7)
        k, m, n, ck, cv = 2, 1024, 96, 128, 256
        mk = jnp.asarray(rng.randn(k, m, ck).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, cv).astype(np.float32))
        q = jnp.asarray(rng.randn(n, ck).astype(np.float32))
        valid = jnp.arange(m) < 900
        ref = memory_read(mk, mv, q, top_k=20, valid=valid,
                          backend="xla_exact")
        mesh = make_mesh_nd(object=2, data=4)
        smk, smv = shard_bank(mesh, mk, mv, object_axis="object")
        out = sharded_memory_read(mesh, smk, smv, q, top_k=20, valid=valid,
                                  object_axis="object")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_2d_read_realistic_shape(self):
        """Production-scale bank (M=20480, the 480p bank at ~38
        committed frames) under the 2D object x position layout."""
        from mivos_tpu.ops.memory_read import memory_read
        from mivos_tpu.parallel.mesh import make_mesh_nd
        from mivos_tpu.parallel.sharded_memory import (shard_bank,
                                                       sharded_memory_read)

        rng = np.random.RandomState(8)
        k, m, n, ck, cv = 2, 20480, 512, 128, 256
        mk = jnp.asarray(rng.randn(k, m, ck).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, cv).astype(np.float32))
        q = jnp.asarray(rng.randn(n, ck).astype(np.float32))
        valid = jnp.arange(m) < 19000
        ref = memory_read(mk, mv, q, top_k=50, valid=valid,
                          backend="xla_exact")
        mesh = make_mesh_nd(object=2, data=4)
        smk, smv = shard_bank(mesh, mk, mv, object_axis="object")
        out = sharded_memory_read(mesh, smk, smv, q, top_k=50,
                                  valid=valid, object_axis="object")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_2d_session_matches_single_device(self):
        from mivos_tpu.parallel.mesh import make_mesh_nd

        k = 2
        prop, params, images = _net(k)
        mesh = make_mesh_nd(object=2, data=4)
        ref = InferenceCore(prop, params, None, None, images, k,
                            mem=MemoryConfig(top_k=10, mem_freq=2))
        sh = InferenceCore(
            prop, params, None, None, images, k,
            mem=MemoryConfig(top_k=10, mem_freq=2, object_sharded=True,
                             bank_sharded=True), mesh=mesh)
        assert sh.prop_net.bank_object_axis == "object"
        m1, m2 = _mask(1, k), _mask(2, k)
        o_ref1 = ref.interact(m1, idx=0).copy()
        o_sh1 = sh.interact(m1, idx=0).copy()
        o_ref2 = ref.interact(m2, idx=TS - 1).copy()
        o_sh2 = sh.interact(m2, idx=TS - 1).copy()
        _assert_sessions_match(ref, sh, [(o_sh1, o_ref1), (o_sh2, o_ref2)])
        assert len(sh.bank.keys.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestEvalPlumbing:
    """The sharded session modes are reachable from the DAVIS protocol
    entry (eval_interactive_davis.py --bank_sharded/--object_shards)."""

    def test_adapt_sharding_downgrades_indivisible_k(self):
        import dataclasses

        from mivos_tpu.eval.davis_interactive import _adapt_sharding
        from mivos_tpu.parallel.mesh import make_mesh_nd

        mem = MemoryConfig(object_sharded=True, bank_sharded=True)
        mesh = make_mesh_nd(object=2, data=4)
        # Divisible K: unchanged.
        m2, s2 = _adapt_sharding(mem, mesh, 4)
        assert m2 is mem and s2 is mesh
        # Indivisible K: object sharding dropped, bank kept on a 1D mesh.
        m3, s3 = _adapt_sharding(mem, mesh, 3)
        assert not m3.object_sharded and m3.bank_sharded
        assert s3.axis_names == ("data",) and s3.size == 8
        # Object-only config with indivisible K: fully unsharded.
        m4, s4 = _adapt_sharding(
            dataclasses.replace(mem, bank_sharded=False), mesh, 3)
        assert not m4.object_sharded and s4 is None

    def test_local_protocol_with_object_sharding(self):
        """Full hermetic protocol (robot -> S2M -> propagate) with an
        object mesh; one sequence divides K, the other downgrades."""
        from mivos_tpu.eval.davis_interactive import run_local_interactive
        from mivos_tpu.models.s2m import S2MNetwork

        t, h, w = 3, 48, 64
        rng = np.random.RandomState(3)
        prop, params, _ = _net(2)
        s2m = S2MNetwork()
        sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((2, h, w, 6)))

        sequences = {}
        for name, k in (("two", 2), ("one", 1)):
            images = rng.rand(t, h, w, 3).astype(np.float32)
            gt = np.zeros((t, h, w), np.int32)
            gt[:, 8:24, 8:28] = 1
            if k == 2:
                gt[:, 28:44, 36:60] = 2
            sequences[name] = (images, gt, k)

        summary = run_local_interactive(
            prop, params, None, None, s2m, sp, sequences,
            max_nb_interactions=2, max_time_per_interaction=1000,
            mem=MemoryConfig(top_k=10, mem_freq=2, object_sharded=True),
            mesh=make_mesh(2, axis="object"))
        assert 0.0 <= summary["auc"] <= 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestFleetProtocol:
    def test_fleet_matches_serial_metric_values(self):
        """Fleet-parallel local protocol: per-round J&F values equal the
        serial run's (robot state is per-sequence; only wall-clock
        timings differ between the two schedules)."""
        from mivos_tpu.eval.davis_interactive import (
            run_local_interactive, run_local_interactive_fleet)
        from mivos_tpu.models.s2m import S2MNetwork

        t, h, w, k = 3, 48, 64, 2
        rng = np.random.RandomState(3)
        prop, params, _ = _net(k)
        s2m = S2MNetwork()
        sp = s2m.init(jax.random.PRNGKey(2), jnp.zeros((k, h, w, 6)))
        sequences = {}
        for name in ("a", "b"):
            images = rng.rand(t, h, w, 3).astype(np.float32)
            gt = np.zeros((t, h, w), np.int32)
            gt[:, 8:24, 8:28] = 1
            gt[:, 28:44, 36:60] = 2
            sequences[name] = (images, gt, k)

        mem = MemoryConfig(top_k=10, mem_freq=2)
        serial = run_local_interactive(
            prop, params, None, None, s2m, sp, sequences,
            max_nb_interactions=2, max_time_per_interaction=1000, mem=mem)
        fleet = run_local_interactive_fleet(
            prop, params, None, None, s2m, sp, sequences,
            max_nb_interactions=2, max_time_per_interaction=1000, mem=mem,
            devices=jax.devices()[:2])
        assert set(fleet["records"]) == set(serial["records"])
        for name in serial["records"]:
            sv = [v for _, v in serial["records"][name]]
            fv = [v for _, v in fleet["records"][name]]
            np.testing.assert_allclose(fv, sv, atol=1e-6)

    def test_fleet_rejects_sharded_sessions(self):
        from mivos_tpu.eval.davis_interactive import (
            run_local_interactive_fleet)

        with pytest.raises(ValueError, match="mutually exclusive"):
            run_local_interactive_fleet(
                None, None, None, None, None, None, {},
                mem=MemoryConfig(bank_sharded=True))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestBankAllocSharded:
    def test_reset_allocates_directly_sharded(self):
        """The bank never materializes unsharded on one device: reset's
        zeros (and certain-memory seed) land with the target sharding."""
        from mivos_tpu.core.memory_bank import MemoryBank
        from mivos_tpu.parallel.sharded_memory import bank_sharding

        mesh = make_mesh(8)
        sh = bank_sharding(mesh)
        bank = MemoryBank(2, 16, cap_frames=64, sharding=sh, min_cap=8)
        seed_k = jnp.ones((2, 32, 128))
        seed_v = jnp.ones((2, 32, 512))
        bank.reset(5, seed_k, seed_v)
        assert bank.keys.sharding == sh and bank.values.sharding == sh
        assert bank.num_slots == 2
        np.testing.assert_allclose(np.asarray(bank.keys[:, :32]), 1.0)
        np.testing.assert_allclose(np.asarray(bank.keys[:, 32:]), 0.0)

    def test_non_power_of_two_axis_rounds_cap_up(self):
        """A 3-device bank axis (buckets are powers of two) rounds the
        capacity up to whole slots per shard instead of asserting."""
        from mivos_tpu.core.memory_bank import MemoryBank
        from mivos_tpu.parallel.mesh import make_mesh_nd
        from mivos_tpu.parallel.sharded_memory import bank_sharding

        mesh = make_mesh_nd(data=3)
        bank = MemoryBank(1, 4, sharding=bank_sharding(mesh), min_cap=3)
        bank.reset(7)
        assert bank.cap % 3 == 0 and bank.cap >= 8
        assert len(bank.keys.sharding.device_set) == 3


class TestMeshNdValidation:
    def test_zero_axis_rejected(self):
        from mivos_tpu.parallel.mesh import make_mesh_nd

        with pytest.raises(ValueError, match=">= 1"):
            make_mesh_nd(object=16, data=0)


class TestObjectShardedValidation:
    def test_requires_mesh(self):
        prop, params, images = _net(1)
        with pytest.raises(ValueError, match="requires a mesh"):
            InferenceCore(prop, params, None, None, images, 1,
                          mem=MemoryConfig(object_sharded=True))

    def test_both_need_a_2d_mesh_with_both_axes(self):
        prop, params, images = _net(1)
        with pytest.raises(ValueError, match="2D mesh"):
            InferenceCore(prop, params, None, None, images, 1,
                          mem=MemoryConfig(object_sharded=True,
                                           bank_sharded=True),
                          mesh=make_mesh(2, axis="data"))

    def test_k_must_divide_axis(self):
        prop, params, images = _net(3)
        with pytest.raises(ValueError, match="divisible"):
            InferenceCore(prop, params, None, None, images, 3,
                          mem=MemoryConfig(object_sharded=True),
                          mesh=make_mesh(2, axis="object"))
