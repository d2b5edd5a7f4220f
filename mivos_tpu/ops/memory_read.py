"""Space-time memory read: the performance-critical op of the framework.

Reference behavior (model/propagation/prop_net.py:47-108): for each query
position, compute affinity against every memory position (dot product of
128-d keys scaled by 1/sqrt(CK)), keep only the top-k memory entries,
softmax them with exp(v - v_max) normalization, and read out a weighted
sum of 512-d memory values.

TPU-native design decisions (this is NOT a translation):
  * Layout is (K, N_query, M_memory) with the softmax/top-k axis LAST, so
    jax.lax.top_k applies directly and both matmuls hit the MXU with the
    contraction on a 128-multiple axis.
  * Instead of the reference's scatter of top-k weights back into a dense
    affinity matrix (prop_net.py:61) — scatters are slow on TPU — we use a
    *threshold* formulation: keep entries with affinity >= the k-th
    largest value. The surviving weights are written by a vectorized
    select into the already-materialized affinity buffer, and the readout
    stays a dense MXU matmul. Numerics are identical up to ties in the
    affinity (measure-zero for float inputs).
  * The memory axis is padded to a bucket size with a validity mask
    (invalid slots get -inf affinity) so the memory bank can grow without
    retracing.

A fused Pallas kernel (ops/pallas/memory_read.py) implements the same
contract for the hot path; this XLA version is the reference semantics
and the fallback.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def affinity_matrix(
    mem_k: jax.Array,
    query_k: jax.Array,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """(K, M, CK) x (N, CK) -> (K, N, M) scaled dot-product affinity.

    Runs at HIGHEST precision by default: the top-k *selection* is
    sensitive to affinity rounding, and on TPU the default fp32 matmul
    path goes through bf16 passes. The CK=128 contraction is tiny next to
    the value readout, so this costs little.
    """
    ck = mem_k.shape[-1]
    scale = 1.0 / math.sqrt(ck)
    return jnp.einsum(
        "kmc,nc->knm", mem_k, query_k * scale,
        preferred_element_type=jnp.float32, precision=precision,
    )


def topk_softmax(
    aff: jax.Array,
    top_k: Optional[int],
    valid: Optional[jax.Array] = None,
    exact: bool = True,
    recall_target: float = 0.95,
) -> jax.Array:
    """Top-k-filtered softmax over the last (memory) axis.

    aff: (K, N, M) affinities. valid: (M,) bool mask of live memory slots.
    Matches softmax_w_g_top (reference prop_net.py:47-73): weights are
    exp(a - a_max) over the top-k set, normalized to sum to 1; everything
    else is 0.

    exact=False switches the selection to jax.lax.approx_max_k — the
    TPU-native partial-reduce top-k (~20x faster than the sort-based
    exact top_k at memory-bank sizes; the entries it can miss are the
    smallest-weight tail of the softmax, so the readout is nearly
    unchanged). Production inference uses approx; parity tests use exact.
    """
    if valid is not None:
        aff = jnp.where(valid[None, None, :], aff, NEG_INF)
    if top_k is None:
        return jax.nn.softmax(aff, axis=-1)
    # Tiny banks (fewer positions than top_k) degrade to a full softmax
    # rather than erroring — e.g. shape-probe inits at small resolutions.
    top_k = min(top_k, aff.shape[-1])
    if exact:
        tv = jax.lax.top_k(aff, top_k)[0]  # (K, N, top_k) sorted desc
    else:
        tv = jax.lax.approx_max_k(aff, top_k,
                                  recall_target=recall_target)[0]
    vmax = tv[..., :1]
    kth = tv[..., -1:]
    w = jnp.where(aff >= kth, jnp.exp(aff - vmax), 0.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def gaussian_kernelized_weights(
    aff: jax.Array, h: int, w: int, sigma: float, top_k: int,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Kernelized-memory (KMN-style) variant of the top-k softmax.

    Implements the `km` path of the reference reader (prop_net.py:90-97):
    each memory position is assigned a Gaussian over query space centered
    at its argmax query location, multiplied into exp(a - a_max) before
    top-k selection. aff is (K, N, M) with N = h*w query positions.
    """
    if valid is not None:
        aff = jnp.where(valid[None, None, :], aff, NEG_INF)
    # Per-memory-position best query location (argmax over N).
    best_q = jnp.argmax(aff, axis=1)  # (K, M)
    by, bx = best_q // w, best_q % w
    qy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    qx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    d2 = (qy[None, :, None] - by[:, None, :].astype(jnp.float32)) ** 2 + (
        qx[None, :, None] - bx[:, None, :].astype(jnp.float32)
    ) ** 2  # (K, N, M)
    g = jnp.exp(-d2 / (2.0 * sigma**2))
    amax = jnp.max(aff, axis=-1, keepdims=True)
    xg = jnp.exp(aff - amax) * g
    tv = jax.lax.top_k(xg, top_k)[0]
    kth = tv[..., -1:]
    wgt = jnp.where(xg >= kth, xg, 0.0)
    return wgt / jnp.sum(wgt, axis=-1, keepdims=True)


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    # The fused Pallas kernel only lowers on TPU (the axon remote
    # platform reports 'axon' but compiles Mosaic kernels).
    plat = jax.devices()[0].platform
    return "pallas" if plat in ("tpu", "axon") else "xla_approx"


def memory_read(
    mem_k: jax.Array,
    mem_v: jax.Array,
    query_k: jax.Array,
    top_k: Optional[int] = 50,
    valid: Optional[jax.Array] = None,
    km: Optional[float] = None,
    query_hw: Optional[tuple] = None,
    backend: str = "auto",
    n_refine: int = 0,
) -> jax.Array:
    """Full memory read (reference EvalMemoryReader, prop_net.py:75-108).

    mem_k: (K, M, CK)  memory keys     (M = padded bank positions)
    mem_v: (K, M, CV)  memory values
    query_k: (N, CK)   query keys, shared across objects
    valid: (M,) bool   live-slot mask
    backend: 'auto' | 'pallas' (fused kernel; TPU hot path, ~3x the
      approx-XLA path and ~40x the exact at production bank sizes) |
      'xla_approx' (approx_max_k) | 'xla_exact' (sort top-k; parity
      oracle). 'auto' picks pallas on TPU, xla_approx elsewhere. The
      kernelized (km) variant and top_k=None always use XLA.
    n_refine: pallas-only threshold-refine passes (see
      ops/pallas/memory_read.py); ignored by the XLA backends.
    Returns (K, N, CV) readout.
    """
    backend = _resolve_backend(backend)
    if backend == "pallas" and km is None and top_k is not None:
        from mivos_tpu.ops.pallas.memory_read import memory_read_pallas

        return memory_read_pallas(mem_k, mem_v, query_k, top_k=top_k,
                                  valid=valid, n_refine=n_refine)
    aff = affinity_matrix(mem_k, query_k)
    if km is not None:
        assert query_hw is not None and top_k is not None
        wgt = gaussian_kernelized_weights(aff, *query_hw, km, top_k, valid)
    else:
        wgt = topk_softmax(aff, top_k, valid, exact=(backend == "xla_exact"))
    return jnp.einsum(
        "knm,kmv->knv",
        wgt.astype(mem_v.dtype),
        mem_v,
        preferred_element_type=jnp.float32,
    )


def full_softmax_affinity(mem_k: jax.Array, query_k: jax.Array) -> jax.Array:
    """T=1 full-softmax affinity for the fusion attention read
    (reference AttentionMemory, prop_net.py:110-129).

    mem_k: (K, M, CK), query_k: (N, CK) -> (K, M, N) with softmax over M.
    Kept in the reference's (memory, query) orientation because callers
    left-multiply by a (1, M) mask row.
    """
    ck = mem_k.shape[-1]
    scale = 1.0 / math.sqrt(ck)
    aff = jnp.einsum(
        "kmc,nc->kmn", mem_k, query_k * scale, preferred_element_type=jnp.float32
    )
    return jax.nn.softmax(aff, axis=1)
