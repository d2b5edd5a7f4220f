"""Bucketed, fixed-capacity space-time memory bank.

The reference pre-allocates a torch buffer sized exactly per pass
(inference_core.py:136-151) and advances a pointer. Under XLA that exact
sizing would retrace jit whenever the bank grows, so here the frame-slot
capacity is rounded up to a bucket (powers of two) and liveness is a
*scalar* `num_valid` passed to the jitted step — growing within a bucket
never retraces, and the set of bucket sizes is O(log T) per process.

Layout: keys (K, cap*n, CK), values (K, cap*n, CV) with slot s occupying
rows [s*n, (s+1)*n). Slot liveness is row-granular: valid rows =
num_valid_slots * n.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mivos_tpu.utils.tensor import dev_i32, memory_buckets, next_bucket


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _write_slot(bank: jax.Array, data: jax.Array, row_start: jax.Array) -> jax.Array:
    """In-place (donated) write of one frame's (K, n, C) rows at row_start."""
    return jax.lax.dynamic_update_slice(bank, data, (0, row_start, 0))


@functools.lru_cache(maxsize=64)
def _alloc_fn(k: int, rows: int, key_dim: int, val_dim: int, dtype, sharding,
              init_rows: int):
    """Bank allocator, cached per (shape, dtype, sharding) so sharded
    resets reuse one executable. With a sharding, the zeros (and the
    certain-memory seed write) materialize DIRECTLY sharded via
    out_shardings — never as a single-device array that would OOM
    device 0 for banks beyond one chip's HBM (the bank_sharded target
    workload) and then pay a full-bank reshard."""

    def build(ik, iv):
        ks = jnp.zeros((k, rows, key_dim), dtype)
        vs = jnp.zeros((k, rows, val_dim), dtype)
        if init_rows:
            ks = jax.lax.dynamic_update_slice(ks, ik.astype(dtype), (0, 0, 0))
            vs = jax.lax.dynamic_update_slice(vs, iv.astype(dtype), (0, 0, 0))
        return ks, vs

    if sharding is not None:
        return jax.jit(build, out_shardings=(sharding, sharding))
    return build


class MemoryBank:
    """Host-managed device memory bank for one propagation pass."""

    def __init__(self, k: int, n: int, key_dim: int = 128, val_dim: int = 512,
                 cap_frames: int = 512, dtype=jnp.float32, sharding=None,
                 min_cap: int = 1):
        self.k, self.n = k, n
        self.key_dim, self.val_dim = key_dim, val_dim
        self.buckets = memory_buckets(cap_frames)
        self.dtype = dtype
        # Distributed bank: a NamedSharding over the position (row) axis
        # (parallel/sharded_memory.bank_sharding). min_cap (the mesh
        # axis size) keeps whole slots per shard so scan writes stay
        # collective-free masked local updates.
        self.sharding = sharding
        self.min_cap = min_cap
        self.cap = 0
        self.num_slots = 0  # committed (valid) slots
        self.keys: Optional[jax.Array] = None
        self.values: Optional[jax.Array] = None

    def reset(self, total_slots: int,
              init_k: Optional[jax.Array] = None,
              init_v: Optional[jax.Array] = None) -> None:
        """Allocate for a pass needing up to total_slots committed slots
        (+1 transient), optionally seeding the first slots from
        (K, s*n, C) certain-memory arrays."""
        cap = next_bucket(max(total_slots + 1, self.min_cap), self.buckets)
        if cap % self.min_cap:
            # Non-power-of-two mesh axes (e.g. a 6-chip bank axis):
            # round up to whole slots per shard. Still O(log T) distinct
            # caps per process, so executables stay shared.
            cap += self.min_cap - cap % self.min_cap
        self.cap = cap
        init_rows = 0 if init_k is None else init_k.shape[1]
        fn = _alloc_fn(self.k, cap * self.n, self.key_dim, self.val_dim,
                       self.dtype, self.sharding, init_rows)
        self.keys, self.values = fn(init_k, init_v)
        self.num_slots = init_rows // self.n

    def write(self, slot: int, mk: jax.Array, mv: jax.Array) -> None:
        """Write one frame's keys/values (K, n, C) into `slot` (may be the
        transient slot == num_slots). Does not change liveness."""
        assert slot < self.cap, (slot, self.cap)
        row = dev_i32(slot * self.n)
        self.keys = _write_slot(self.keys, mk.astype(self.dtype), row)
        self.values = _write_slot(self.values, mv.astype(self.dtype), row)

    def commit(self) -> None:
        """Promote the transient slot to committed."""
        self.num_slots += 1
        assert self.num_slots <= self.cap

    def valid_rows(self, include_transient: bool) -> jax.Array:
        """Scalar count of live rows for the jitted step (not a mask: the
        mask is materialized inside jit so its *value* can change without
        retracing)."""
        slots = self.num_slots + (1 if include_transient else 0)
        return dev_i32(slots * self.n)

    @property
    def total_rows(self) -> int:
        return self.cap * self.n
