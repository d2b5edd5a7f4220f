"""Bank-sharded memory read on the 8-device virtual mesh: must equal
the single-device exact top-k read bit-for-bit in support."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.ops.memory_read import memory_read
from mivos_tpu.parallel.mesh import make_mesh
from mivos_tpu.parallel.sharded_memory import shard_bank, sharded_memory_read


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
