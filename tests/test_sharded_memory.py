"""Bank-sharded memory read/write on the 8-device virtual mesh: must
equal the single-device exact top-k read bit-for-bit in support, and a
full InferenceCore session with a sharded bank must match the
single-device session (VERDICT r2 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.ops.memory_read import memory_read
from mivos_tpu.parallel.mesh import make_mesh
from mivos_tpu.parallel.sharded_memory import (bank_sharding, shard_bank,
                                               sharded_bank_write,
                                               sharded_memory_read)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedMemoryRead:
    def test_exact_vs_single_device(self, rng):
        k, m, n, ck, cv = 2, 1024, 96, 128, 256
        mk = jnp.asarray(rng.randn(k, m, ck).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, cv).astype(np.float32))
        q = jnp.asarray(rng.randn(n, ck).astype(np.float32))
        valid = jnp.arange(m) < 900

        ref = memory_read(mk, mv, q, top_k=20, valid=valid,
                          backend="xla_exact")
        mesh = make_mesh(8)
        smk, smv = shard_bank(mesh, mk, mv)
        out = sharded_memory_read(mesh, smk, smv, q, top_k=20, valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_small_bank_degenerates_gracefully(self, rng):
        """top_k larger than any shard's local slice still works (the
        gathered candidate pool shrinks to the whole bank)."""
        k, m, n = 1, 64, 32
        mk = jnp.asarray(rng.randn(k, m, 128).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, 64).astype(np.float32))
        q = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        ref = memory_read(mk, mv, q, top_k=64, backend="xla_exact")
        mesh = make_mesh(8)
        out = sharded_memory_read(mesh, mk, mv, q, top_k=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_realistic_bank_shape(self, rng):
        """Production-scale bank (M >= 20k positions, the 480p bank at
        ~38 committed frames) with the default top_k=50 and a partially
        valid tail — the long-video shape SURVEY.md section 5.7 maps to
        sequence parallelism."""
        k, m, n, ck, cv = 3, 20480, 512, 128, 256
        mk = jnp.asarray(rng.randn(k, m, ck).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, cv).astype(np.float32))
        q = jnp.asarray(rng.randn(n, ck).astype(np.float32))
        valid = jnp.arange(m) < 19000
        ref = memory_read(mk, mv, q, top_k=50, valid=valid,
                          backend="xla_exact")
        mesh = make_mesh(8)
        smk, smv = shard_bank(mesh, mk, mv)
        out = sharded_memory_read(mesh, smk, smv, q, top_k=50, valid=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedBankWrite:
    def test_masked_local_write_matches_dense_update(self, rng):
        k, cap, n, c, d = 2, 8, 16, 32, 8
        m = cap * n
        mesh = make_mesh(d)
        bank = jax.device_put(
            jnp.asarray(rng.randn(k, m, c).astype(np.float32)),
            bank_sharding(mesh))
        ref = np.array(bank)  # writable copy
        for slot in (0, 3, 7):       # first, interior, last shard
            data = rng.randn(k, n, c).astype(np.float32)
            bank = sharded_bank_write(mesh, bank, jnp.asarray(data),
                                      slot * n)
            ref[:, slot * n:(slot + 1) * n] = data
            np.testing.assert_allclose(np.asarray(bank), ref, atol=0)

    def test_traced_row_inside_jit(self, rng):
        k, cap, n, c, d = 1, 8, 8, 16, 8
        mesh = make_mesh(d)
        bank = jax.device_put(jnp.zeros((k, cap * n, c)),
                              bank_sharding(mesh))
        data = jnp.asarray(rng.randn(k, n, c).astype(np.float32))

        @jax.jit
        def write(b, dat, row):
            return sharded_bank_write(mesh, b, dat, row)

        out = write(bank, data, jnp.int32(5 * n))
        np.testing.assert_allclose(np.asarray(out)[:, 5 * n:6 * n],
                                   np.asarray(data), atol=0)
        assert float(jnp.abs(out).sum()) == pytest.approx(
            float(jnp.abs(data).sum()), rel=1e-6)


TS, RH, RW, KOBJ = 8, 45, 62, 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedSession:
    """The session-level consumer: InferenceCore(mem.bank_sharded=True)
    runs its scan passes with the bank's position axis sharded over the
    mesh, and must match the single-device exact-read session."""

    @pytest.fixture(scope="class")
    def nets(self):
        prop = PropagationNetwork(top_k=10, read_backend="xla_exact")
        frame = jnp.zeros((48, 64, 3))
        masks = jnp.zeros((KOBJ, 48, 64, 1))
        params = prop.init(jax.random.PRNGKey(0), frame, masks, frame)
        rng = np.random.RandomState(0)
        images = rng.rand(TS, RH, RW, 3).astype(np.float32)
        return prop, params, images

    def _mask(self, seed):
        from mivos_tpu.utils.tensor import one_hot_mask

        rng = np.random.RandomState(seed)
        labels = jnp.asarray(rng.randint(0, KOBJ + 1, (RH, RW)))
        fg = one_hot_mask(labels, KOBJ)
        bg = 1.0 - fg.sum(0, keepdims=True)
        return jnp.concatenate([bg, fg], axis=0)

    def test_multiround_session_matches_single_device(self, nets):
        prop, params, images = nets
        mesh = make_mesh(8)

        ref = InferenceCore(prop, params, None, None, images, KOBJ,
                            mem=MemoryConfig(top_k=10, mem_freq=2))
        sh = InferenceCore(prop, params, None, None, images, KOBJ,
                           mem=MemoryConfig(top_k=10, mem_freq=2,
                                            bank_sharded=True), mesh=mesh)
        assert sh.prop_net.bank_mesh is mesh
        m1, m2 = self._mask(1), self._mask(2)
        out_ref1 = ref.interact(m1, idx=0).copy()
        out_sh1 = sh.interact(m1, idx=0).copy()
        out_ref2 = ref.interact(m2, idx=TS - 1).copy()
        out_sh2 = sh.interact(m2, idx=TS - 1).copy()

        # Probabilities: both paths are exact top-k reads; only summation
        # order differs (psum of shard partials).
        for ti in range(TS):
            np.testing.assert_allclose(np.asarray(sh.get_prob(ti)),
                                       np.asarray(ref.get_prob(ti)),
                                       atol=2e-4)
        # Labels agree except argmax coin-flips on near-tied pixels.
        assert (out_sh1 == out_ref1).mean() > 0.999
        assert (out_sh2 == out_ref2).mean() > 0.999
        # The bank really is sharded across the mesh.
        shards = sh.bank.keys.sharding
        assert len(shards.device_set) == 8

    def test_fused_session_matches_single_device(self, nets):
        """Difference-aware fusion active (round 2 propagates INTO
        interacted territory): the fuse path reads the bank-adjacent
        attention from replicated tensors, so it must compose cleanly
        with the sharded bank carry."""
        from mivos_tpu.models.fusion import FusionNet

        prop, params, images = nets
        fuse = FusionNet()
        fp = fuse.init(jax.random.PRNGKey(1),
                       jnp.zeros((KOBJ, 48, 64, 3)),
                       jnp.zeros((KOBJ, 48, 64, 1)),
                       jnp.zeros((KOBJ, 48, 64, 1)),
                       jnp.zeros((KOBJ, 48, 64, 2)), jnp.zeros((KOBJ, 2)))
        mesh = make_mesh(8)
        ref = InferenceCore(prop, params, fuse, fp, images, KOBJ,
                            mem=MemoryConfig(top_k=10, mem_freq=2))
        sh = InferenceCore(prop, params, fuse, fp, images, KOBJ,
                           mem=MemoryConfig(top_k=10, mem_freq=2,
                                            bank_sharded=True), mesh=mesh)
        ref.interact(self._mask(5), idx=0)
        sh.interact(self._mask(5), idx=0)
        out_ref = ref.interact(self._mask(6), idx=TS - 1)
        out_sh = sh.interact(self._mask(6), idx=TS - 1)
        for ti in range(TS):
            np.testing.assert_allclose(np.asarray(sh.get_prob(ti)),
                                       np.asarray(ref.get_prob(ti)),
                                       atol=2e-4)
        assert (out_sh == out_ref).mean() > 0.999

    def test_bank_sharded_requires_mesh_and_profile0(self, nets):
        prop, params, images = nets
        with pytest.raises(ValueError, match="requires a mesh"):
            InferenceCore(prop, params, None, None, images, KOBJ,
                          mem=MemoryConfig(bank_sharded=True))
        with pytest.raises(ValueError, match="mem_profile"):
            InferenceCore(prop, params, None, None, images, KOBJ,
                          mem=MemoryConfig(bank_sharded=True,
                                           mem_profile=1),
                          mesh=make_mesh(8))
