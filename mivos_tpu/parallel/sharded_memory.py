"""Memory-bank sharding across a device mesh — the sequence-parallel
analog of this workload (SURVEY.md §5.7).

The space-time memory read attends each query over T*H*W memory
positions; for very long videos the bank outgrows one chip's HBM. Here
the bank's position axis is sharded over a mesh axis and the read runs
as shard_map:

  1. local affinity (K, N, M/D) on each device;
  2. local exact top-k per row -> (K, N, k) candidate values;
  3. all_gather the candidates over ICI ((D*k) per row — tiny compared
     to the bank) and take the global k-th: since every member of the
     global top-k is in its home shard's local top-k, the gathered
     candidate set contains the exact global top-k, so the threshold
     (and the row max) are EXACT, not approximate;
  4. local thresholded exp readout, combined with psum.

Communication per read: one all_gather of (K, N, k) floats and one
psum of (K, N, CV) — both O(query), independent of bank length. The
reference has no distributed inference at all (single cuda:0,
reference inference_core.py:36).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mivos_tpu.ops.memory_read import affinity_matrix

NEG_INF = -1e30


def sharded_memory_read(mesh: Mesh, mem_k: jax.Array, mem_v: jax.Array,
                        query_k: jax.Array, top_k: int = 50,
                        valid: Optional[jax.Array] = None,
                        axis: str = "data",
                        object_axis: Optional[str] = None) -> jax.Array:
    """mem_k (K, M, CK), mem_v (K, M, CV) sharded (or shardable) on M;
    query_k (N, CK) replicated. M must divide the axis size. Returns the
    (K, N, CV) readout, exactly equal to the single-device exact top-k
    read — replicated, or sharded on K when `object_axis` names a second
    mesh axis (the 2D object x position layout: each device owns its
    objects' bank slice, collectives run over the position axis only,
    and the object axis stays embarrassingly parallel)."""
    k, m, ck = mem_k.shape
    n = query_k.shape[0]
    d = mesh.shape[axis]
    assert m % d == 0, (m, d)
    if object_axis is not None:
        k_local = k // mesh.shape[object_axis]
        assert k % mesh.shape[object_axis] == 0, (k, mesh.shape[object_axis])
        k = k_local
    obj = object_axis  # spec shorthand (None = replicated over objects)
    if valid is None:
        valid = jnp.ones((m,), bool)

    def local(mk, mv, qk, vl):
        # HIGHEST precision: on TPU the default fp32 matmul is a single
        # bf16 MXU pass (~0.4% relative), which at O(10)-magnitude
        # trained-encoder affinities perturbs both the top-k selection
        # and exp weights — the same failure mode the Pallas kernel's
        # _affinity fixes. Exactness of this read requires the local
        # affinity to match ops/memory_read.affinity_matrix bit-for-bit.
        aff = affinity_matrix(mk, qk)
        aff = jnp.where(vl[None, None, :], aff, NEG_INF)
        local_k = min(top_k, aff.shape[-1])
        cand = jax.lax.top_k(aff, local_k)[0]            # (K, N, local_k)
        allc = jax.lax.all_gather(cand, axis)            # (D, K, N, lk)
        allc = jnp.moveaxis(allc, 0, 2).reshape(k, n, d * local_k)
        kk = min(top_k, d * local_k)
        gtop = jax.lax.top_k(allc, kk)[0]
        gmax = gtop[..., :1]
        kth = gtop[..., kk - 1:kk]
        w = jnp.where(aff >= kth, jnp.exp(aff - gmax), 0.0)
        acc = jnp.einsum("knm,kmv->knv", w.astype(mv.dtype), mv,
                         preferred_element_type=jnp.float32)
        wsum = jnp.sum(w, axis=-1, keepdims=True)
        acc = jax.lax.psum(acc, axis)
        wsum = jax.lax.psum(wsum, axis)
        return acc / wsum

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(obj, axis, None), P(obj, axis, None), P(), P(axis)),
        out_specs=P(obj))
    return fn(mem_k, mem_v, query_k, valid)


def object_sharded_memory_read(mesh: Mesh, mem_k: jax.Array,
                               mem_v: jax.Array, query_k: jax.Array,
                               top_k=50, valid: Optional[jax.Array] = None,
                               axis: str = "object", km=None,
                               query_hw=None, backend: str = "auto",
                               n_refine: int = 0) -> jax.Array:
    """Memory read with ONLY the object axis sharded (K % axis == 0).

    Per-object reads are independent, so this is zero-collective — but
    it must be shard_map (manual mode), not GSPMD constraints: the
    Pallas kernel is an unpartitionable custom call that GSPMD would
    all-gather around, while inside shard_map each device runs the fused
    kernel on its local objects at full speed. Falls through to the
    requested XLA backend on other platforms (ops/memory_read.py)."""
    from mivos_tpu.ops.memory_read import memory_read

    if valid is None:
        valid = jnp.ones((mem_k.shape[1],), bool)

    def local(mk, mv, qk, vl):
        return memory_read(mk, mv, qk, top_k=top_k, valid=vl, km=km,
                           query_hw=query_hw, backend=backend,
                           n_refine=n_refine)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(), P()),
        out_specs=P(axis, None, None),
        # pallas_call's output avals carry no varying-mesh-axes info, so
        # the vma check cannot see through the kernel; the specs above
        # are the contract (object-batched in, object-batched out).
        check_vma=False)
    return fn(mem_k, mem_v, query_k, valid)


def shard_bank(mesh: Mesh, mem_k: jax.Array, mem_v: jax.Array,
               axis: str = "data",
               object_axis: Optional[str] = None):
    """Place a bank with its position axis sharded over `axis` (and its
    object axis over `object_axis` when given)."""
    sh = bank_sharding(mesh, axis, object_axis)
    return jax.device_put(mem_k, sh), jax.device_put(mem_v, sh)


def bank_sharding(mesh: Mesh, axis: str = "data",
                  object_axis: Optional[str] = None) -> NamedSharding:
    """The (K, M, C) sharding of a distributed bank: position axis over
    `axis`, optionally the object axis over `object_axis` (2D layout)."""
    return NamedSharding(mesh, P(object_axis, axis, None))


def sharded_bank_write(mesh: Mesh, bank: jax.Array, data: jax.Array,
                       row, axis: str = "data",
                       object_axis: Optional[str] = None) -> jax.Array:
    """Write one frame's (K, n, C) rows at global row offset `row` into a
    position-sharded (K, M, C) bank WITHOUT gathering it.

    Exactly one shard owns the write (the session keeps whole slots per
    shard: bank capacity a multiple of the axis size, rows a multiple of
    the per-frame token count n), so each device does a masked local
    dynamic-update-slice — zero communication, unlike letting GSPMD
    partition a global dynamic_update_slice on the sharded axis (which
    gathers). `row` may be a traced scalar (the scan's per-step write
    schedule)."""
    d = mesh.shape[axis]
    k, m, c = bank.shape
    if object_axis is not None:
        assert k % mesh.shape[object_axis] == 0, (k, mesh.shape[object_axis])
        k //= mesh.shape[object_axis]
    local_m = m // d
    n = data.shape[1]
    assert m % d == 0 and local_m >= n, (m, d, n)

    def local(bk, dat, r):
        base = jax.lax.axis_index(axis) * local_m
        loc = r - base
        owns = (loc >= 0) & (loc + n <= local_m)
        lc = jnp.clip(loc, 0, local_m - n)
        old = jax.lax.dynamic_slice(bk, (0, lc, 0), (k, n, c))
        mixed = jnp.where(owns, dat.astype(bk.dtype), old)
        return jax.lax.dynamic_update_slice(bk, mixed, (0, lc, 0))

    obj = object_axis
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(obj, axis, None), P(obj), P()),
                       out_specs=P(obj, axis, None))
    return fn(bank, data, jnp.asarray(row, jnp.int32))
