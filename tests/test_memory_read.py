"""Memory-read op: threshold top-k softmax vs an exact scatter reference.

The exact reference here mirrors the torch softmax_w_g_top semantics
(reference prop_net.py:47-73) using numpy: exact top-k selection,
exp(v - v_top1) normalization, scatter back to dense, dense readout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib
mr = importlib.import_module('mivos_tpu.ops.memory_read')


def naive_topk_read(mem_k, mem_v, qk, top_k, valid=None):
    K, M, CK = mem_k.shape
    N = qk.shape[0]
    aff = np.einsum("kmc,nc->knm", mem_k, qk) / np.sqrt(CK)
    if valid is not None:
        aff = np.where(valid[None, None, :], aff, -1e30)
    out_w = np.zeros_like(aff)
    for k in range(K):
        for n in range(N):
            row = aff[k, n]
            idx = np.argsort(-row)[:top_k]
            v = row[idx]
            e = np.exp(v - v[0])
            e /= e.sum()
            out_w[k, n, idx] = e
    return np.einsum("knm,kmv->knv", out_w, mem_v), out_w


@pytest.mark.parametrize("top_k", [5, 16])
def test_matches_naive(rng, top_k):
    K, M, N, CK, CV = 3, 64, 32, 8, 12
    mem_k = rng.randn(K, M, CK).astype(np.float32)
    mem_v = rng.randn(K, M, CV).astype(np.float32)
    qk = rng.randn(N, CK).astype(np.float32)
    ref, ref_w = naive_topk_read(mem_k, mem_v, qk, top_k)
    got = np.asarray(
        mr.memory_read(jnp.asarray(mem_k), jnp.asarray(mem_v), jnp.asarray(qk),
                       top_k=top_k)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_masked_slots_excluded(rng):
    K, M, N, CK, CV = 2, 32, 16, 8, 4
    mem_k = rng.randn(K, M, CK).astype(np.float32)
    mem_v = rng.randn(K, M, CV).astype(np.float32)
    qk = rng.randn(N, CK).astype(np.float32)
    valid = np.zeros(M, bool)
    valid[:20] = True
    # Poison the invalid value slots: they must not leak into the readout.
    mem_v_poisoned = mem_v.copy()
    mem_v_poisoned[:, 20:] = 1e9
    ref, _ = naive_topk_read(mem_k[:, :20], mem_v[:, :20], qk, 5)
    got = np.asarray(
        mr.memory_read(jnp.asarray(mem_k), jnp.asarray(mem_v_poisoned),
                       jnp.asarray(qk), top_k=5, valid=jnp.asarray(valid))
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_weights_sum_to_one(rng):
    aff = jnp.asarray(rng.randn(2, 10, 40).astype(np.float32))
    w = mr.topk_softmax(aff, 7)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    # Exactly top_k nonzero entries per row (no ties with random floats).
    assert int((np.asarray(w) > 0).sum(-1).max()) == 7
    assert int((np.asarray(w) > 0).sum(-1).min()) == 7


def test_full_softmax_when_topk_none(rng):
    aff = jnp.asarray(rng.randn(1, 4, 9).astype(np.float32))
    w = mr.topk_softmax(aff, None)
    np.testing.assert_allclose(np.asarray(w), np.asarray(jax.nn.softmax(aff, -1)),
                               atol=1e-6)


def test_full_softmax_affinity_normalizes_over_memory(rng):
    mem_k = jnp.asarray(rng.randn(2, 30, 8).astype(np.float32))
    qk = jnp.asarray(rng.randn(12, 8).astype(np.float32))
    aff = mr.full_softmax_affinity(mem_k, qk)
    assert aff.shape == (2, 30, 12)
    np.testing.assert_allclose(np.asarray(aff.sum(1)), 1.0, atol=1e-5)


def test_gaussian_kernelized_weights(rng):
    # Smoke + invariants: normalized, <= top_k support, jit-able.
    K, h, w, M, CK = 1, 4, 4, 24, 8
    mem_k = rng.randn(K, M, CK).astype(np.float32)
    qk = rng.randn(h * w, CK).astype(np.float32)
    aff = mr.affinity_matrix(jnp.asarray(mem_k), jnp.asarray(qk))
    wgt = mr.gaussian_kernelized_weights(aff, h, w, sigma=7.0, top_k=5)
    np.testing.assert_allclose(np.asarray(wgt.sum(-1)), 1.0, atol=1e-5)
    assert int((np.asarray(wgt) > 0).sum(-1).max()) <= 5 + 1  # tie slack
