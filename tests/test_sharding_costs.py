"""Compiled-cost evidence for the sharded inference paths (the scaling
claims in config.py, asserted from XLA's own per-device cost model —
parallel/costs.py):

- bank_sharded: read collectives are O(query) bytes, INDEPENDENT of the
  bank length M; per-device FLOPs scale with M/D; per-slot writes are
  collective-free (parallel/sharded_memory.py docstrings).
- object_sharded: the per-object read is zero-collective; the full
  per-frame step (query encode -> read -> decode -> aggregate ->
  memorize, mirroring core/inference.py's scan body) puts >= 90% of
  its FLOPs on the object axis (config.py claims ~95%), with cross-
  object collective traffic O(K*H*W) — no bank- or activation-tower-
  sized payloads.

Real multi-chip latency cannot be measured in this sandbox (one chip
via a tunnel); the compiled executable's cost analysis per virtual-mesh
device is the honest substitute. The reference has no distributed
inference at all (reference inference_core.py:36).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.parallel.costs import collective_bytes, compiled_flops
from mivos_tpu.parallel.mesh import make_mesh, make_mesh_nd

K, N, CK, CV, TOPK = 2, 96, 128, 256, 20
D = 8


def _lower_read(mesh, m, object_axis=None):
    from mivos_tpu.parallel.sharded_memory import sharded_memory_read

    fn = functools.partial(sharded_memory_read, mesh, top_k=TOPK,
                           object_axis=object_axis)
    return jax.jit(fn).lower(
        jax.ShapeDtypeStruct((K, m, CK), jnp.float32),
        jax.ShapeDtypeStruct((K, m, CV), jnp.float32),
        jax.ShapeDtypeStruct((N, CK), jnp.float32),
        valid=jax.ShapeDtypeStruct((m,), jnp.bool_)).compile()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestBankShardedReadCosts:
    def test_collective_bytes_are_o_query_and_m_independent(self):
        mesh = make_mesh(D)
        m1, m2 = 4096, 16384
        c1, c2 = _lower_read(mesh, m1), _lower_read(mesh, m2)
        b1, b2 = collective_bytes(c1), collective_bytes(c2)
        # The ONLY collectives are the candidate all-gather and the
        # readout psum — and their volume does not change when the bank
        # grows 4x (O(query), sharded_memory.py:18-21).
        assert set(b1) <= {"all-gather", "all-reduce"}, b1
        assert b1 == b2, (b1, b2)
        # Analytic wire volume: gather of (D, K, N, top_k) candidates;
        # psum of the (K, N, CV) readout accumulator + (K, N, 1) weight
        # sum (both fp32).
        assert b1["all-gather"] == D * K * N * TOPK * 4, b1
        assert b1["all-reduce"] == K * N * (CV + 1) * 4, b1

    def test_per_device_flops_scale_with_local_bank(self):
        mesh = make_mesh(D)
        m1, m2 = 4096, 16384
        f1, f2 = compiled_flops(_lower_read(mesh, m1)), compiled_flops(
            _lower_read(mesh, m2))
        # Affinity + readout matmuls dominate and are M-linear; a 4x
        # bank must cost ~4x per-device FLOPs (each device still owns
        # M/D positions).
        assert 3.0 < f2 / f1 < 4.5, (f1, f2)
        # Absolute check: at least the two M-linear matmuls on the
        # local shard, at most ~2x that (top-k/selection overhead).
        lower = 2 * K * N * (m2 // D) * (CK + CV)
        assert lower <= f2 < 2.0 * lower, (f2, lower)

    def test_write_is_collective_free(self):
        from mivos_tpu.parallel.sharded_memory import sharded_bank_write

        mesh = make_mesh(D)
        m, n = 4096, 12
        fn = functools.partial(sharded_bank_write, mesh)
        compiled = jax.jit(fn).lower(
            jax.ShapeDtypeStruct((K, m, CK), jnp.float32),
            jax.ShapeDtypeStruct((K, n, CK), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32)).compile()
        assert collective_bytes(compiled) == {}

    def test_2d_layout_keeps_collectives_on_position_axis(self):
        """object x position mesh: collective volume shrinks by the
        object-axis factor (each device gathers/reduces only its own
        objects' rows) and stays M-independent."""
        mesh = make_mesh_nd(object=2, data=4)
        c1 = _lower_read(mesh, 4096, object_axis="object")
        c2 = _lower_read(mesh, 16384, object_axis="object")
        b1, b2 = collective_bytes(c1), collective_bytes(c2)
        assert b1 == b2, (b1, b2)
        d_pos, k_local = 4, K // 2
        assert b1["all-gather"] == d_pos * k_local * N * TOPK * 4, b1
        assert b1["all-reduce"] == k_local * N * (CV + 1) * 4, b1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestObjectShardedReadCosts:
    def test_zero_collectives_and_per_device_flops_k_over_d(self):
        from mivos_tpu.ops.memory_read import memory_read
        from mivos_tpu.parallel.sharded_memory import (
            object_sharded_memory_read)

        k, m = 8, 2048
        mesh = make_mesh(D, axis="object")
        fn = functools.partial(object_sharded_memory_read, mesh,
                               top_k=TOPK, backend="xla_exact")
        sharded = jax.jit(fn).lower(
            jax.ShapeDtypeStruct((k, m, CK), jnp.float32),
            jax.ShapeDtypeStruct((k, m, CV), jnp.float32),
            jax.ShapeDtypeStruct((N, CK), jnp.float32),
            valid=jax.ShapeDtypeStruct((m,), jnp.bool_)).compile()
        # Per-object reads are independent: NO cross-device traffic.
        assert collective_bytes(sharded) == {}
        # Each device runs exactly the K=1 single-device program.
        ref = jax.jit(functools.partial(
            memory_read, top_k=TOPK, backend="xla_exact")).lower(
            jax.ShapeDtypeStruct((1, m, CK), jnp.float32),
            jax.ShapeDtypeStruct((1, m, CV), jnp.float32),
            jax.ShapeDtypeStruct((N, CK), jnp.float32),
            valid=jax.ShapeDtypeStruct((m,), jnp.bool_)).compile()
        fs, f1 = compiled_flops(sharded), compiled_flops(ref)
        assert 0.9 < fs / f1 < 1.1, (fs, f1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestObjectShardedStepCosts:
    """The full per-frame propagation step (the scan body of
    core/inference.py:220-232) under GSPMD object sharding: the object-
    parallel FLOP fraction and the cross-object collective volume."""

    H, W = 48, 64
    K_STEP = 8

    def _step_fn(self, prop):
        from mivos_tpu.ops.aggregate import aggregate_wbg

        def step(params, mem_k, mem_v, valid, image):
            f16, f8, f4, k16, v16 = prop.apply(
                params, image, method="get_query_values")
            out = prop.apply(params, mem_k, mem_v, valid, f16, f8, f4,
                             k16, v16, method="segment_with_query")
            agg = aggregate_wbg(out, keep_bg=True)
            mk, mv = prop.apply(params, image, agg[1:], method="memorize")
            return agg, mk, mv

        return step

    def _compile(self, prop, params, t_mem=2):
        h, w = self.H, self.W
        m = t_mem * (h // 16) * (w // 16)
        return jax.jit(self._step_fn(prop)).lower(
            params,
            jax.ShapeDtypeStruct((self.K_STEP, m, 128), jnp.float32),
            jax.ShapeDtypeStruct((self.K_STEP, m, 512), jnp.float32),
            jax.ShapeDtypeStruct((m,), jnp.bool_),
            jax.ShapeDtypeStruct((h, w, 3), jnp.float32)).compile()

    @pytest.fixture(scope="class")
    def nets(self):
        from mivos_tpu.models.propagation import PropagationNetwork

        mesh = make_mesh(D, axis="object")
        base = PropagationNetwork(top_k=10, read_backend="xla_exact")
        sharded = PropagationNetwork(top_k=10, read_backend="xla_exact",
                                     object_mesh=mesh,
                                     object_axis="object")
        params = base.init(jax.random.PRNGKey(0),
                           jnp.zeros((self.H, self.W, 3)),
                           jnp.zeros((self.K_STEP, self.H, self.W, 1)),
                           jnp.zeros((self.H, self.W, 3)))
        return base, sharded, params

    def test_object_parallel_flop_fraction(self, nets):
        base, sharded, params = nets
        f1 = compiled_flops(self._compile(base, params))
        fd = compiled_flops(self._compile(sharded, params))
        # F_sharded = F_full*(1-p) + F_full*p/D  =>  the object-parallel
        # fraction p. The unsharded remainder is the query tower + the
        # decoder skip towers (which run once and broadcast over K);
        # everything K-batched must actually shard (p collapses toward
        # 0 if GSPMD replicates a tower). Measured: p ~ 0.86 at K=8 —
        # a 4.1x per-device FLOP reduction on 8 chips (config.py).
        p = (1.0 - fd / f1) / (1.0 - 1.0 / D)
        assert p >= 0.82, (p, f1, fd)

    def test_production_shape_fraction(self):
        """The config.py numbers at the REAL production shape: 480p
        padded (480x864), K=3 objects over a 3-device object axis,
        2-frame bank (compile-only — nothing executes). The shared
        query tower + decoder skip towers are a bigger share at K=3
        than K=8, so p is lower here (~0.72 measured -> 1.9x
        per-device FLOP reduction on 3 chips)."""
        from mivos_tpu.models.propagation import PropagationNetwork

        h, w, k, d = 480, 864, 3, 3
        mesh = make_mesh(d, axis="object")
        base = PropagationNetwork(top_k=50, read_backend="xla_exact")
        sharded = PropagationNetwork(top_k=50, read_backend="xla_exact",
                                     object_mesh=mesh,
                                     object_axis="object")
        params = jax.eval_shape(
            lambda: base.init(jax.random.PRNGKey(0), jnp.zeros((h, w, 3)),
                              jnp.zeros((k, h, w, 1)), jnp.zeros((h, w, 3))))
        m = 2 * (h // 16) * (w // 16)

        def compile_step(prop):
            return jax.jit(self._step_fn(prop)).lower(
                params,
                jax.ShapeDtypeStruct((k, m, 128), jnp.float32),
                jax.ShapeDtypeStruct((k, m, 512), jnp.float32),
                jax.ShapeDtypeStruct((m,), jnp.bool_),
                jax.ShapeDtypeStruct((h, w, 3), jnp.float32)).compile()

        f1 = compiled_flops(compile_step(base))
        fd = compiled_flops(compile_step(sharded))
        p = (1.0 - fd / f1) / (1.0 - 1.0 / d)
        assert p >= 0.70, (p, f1, fd)
        # Per-device FLOPs at most ~55% of single-device (1.8x+).
        assert fd / f1 <= 0.55, (fd, f1)

    def test_cross_object_collectives_are_o_khw(self, nets):
        _, sharded, params = nets
        compiled = self._compile(sharded, params)
        total = sum(collective_bytes(compiled).values())
        # The only cross-object mixing is the soft aggregate (background
        # product + softmax over K) and the 'others' mask inside
        # memorize — O(K*H*W) payloads, never bank- or feature-tower-
        # sized. Generous constant: a handful of fp32 K-planes.
        assert 0 < total <= 24 * self.K_STEP * self.H * self.W * 4, total

    def test_collectives_independent_of_bank_length(self, nets):
        _, sharded, params = nets
        b2 = collective_bytes(self._compile(sharded, params, t_mem=2))
        b6 = collective_bytes(self._compile(sharded, params, t_mem=6))
        assert b2 == b6, (b2, b6)
