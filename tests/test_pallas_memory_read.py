"""Fused Pallas memory-read kernel vs the XLA exact reference.

Runs in interpret mode on the CPU test platform; the same kernel code
compiles through Mosaic on TPU. Reference semantics under test:
softmax_w_g_top (reference model/propagation/prop_net.py:47-73) —
exp(a - a_top1) over the top-k support, normalized.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.ops.memory_read import memory_read
from mivos_tpu.ops.pallas.memory_read import memory_read_pallas


def _peaky_inputs(rng, k, m, n, ck=128, cv=512):
    """Clustered affinity spectra like trained STM keys: each query
    matches a small set of memory positions far above the rest."""
    lat = rng.randn(32, ck).astype(np.float32)
    mk = (rng.randn(k, m, 32).astype(np.float32) ** 3) @ lat * 0.15
    q = (rng.randn(n, 32).astype(np.float32) ** 3) @ lat * 0.15
    mv = rng.randn(k, m, cv).astype(np.float32)
    return jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(q)


class TestPallasMemoryRead:
    def test_matches_exact_topk_on_peaky_spectra(self, rng):
        mk, mv, q = _peaky_inputs(rng, k=2, m=2500, n=300)
        valid = jnp.arange(2500) < 2000
        ref = memory_read(mk, mv, q, top_k=50, valid=valid,
                          backend="xla_exact")
        out = memory_read_pallas(mk, mv, q, top_k=50, valid=valid,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_full_softmax_when_topk_geq_m(self, rng):
        """top_k >= live entries degrades to full softmax, equal to the
        XLA full-softmax read up to tile-accumulation rounding."""
        mk, mv, q = _peaky_inputs(rng, k=1, m=1500, n=200)
        valid = jnp.arange(1500) < 1200
        ref = memory_read(mk, mv, q, top_k=None, valid=valid)
        out = memory_read_pallas(mk, mv, q, top_k=1500, valid=valid,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_superset_support_direction(self, rng):
        """The threshold is a lower bound on the exact k-th affinity:
        the kernel's support is a superset of exact top-k, so its
        readout sits between exact top-k and full softmax. Verify the
        kernel is closer to exact-topk than full softmax is (adversarial
        Gaussian spectra where the support boundary is dense)."""
        k, m, n = 2, 2048, 256
        mk = jnp.asarray(rng.randn(k, m, 128).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, 512).astype(np.float32))
        q = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        exact = np.asarray(memory_read(mk, mv, q, top_k=50,
                                       backend="xla_exact"))
        full = np.asarray(memory_read(mk, mv, q, top_k=None))
        out = np.asarray(memory_read_pallas(mk, mv, q, top_k=50,
                                            interpret=True))
        err_kernel = np.abs(out - exact).mean()
        err_full = np.abs(full - exact).mean()
        assert err_kernel < 0.5 * err_full, (err_kernel, err_full)

    def test_clustered_bin_collisions_stay_superset(self, rng):
        """Adversarial phase-A input: the top entries sit exactly C_BINS
        positions apart, so they ALL share one bin in partition 1 and
        the per-bin top-2 undercounts maximally there. Partition 2's
        roll offsets must keep the count honest enough, and whatever
        slack remains must stay on the SAFE side (superset support,
        refine recovers tightness)."""
        from mivos_tpu.ops.pallas.memory_read import C_BINS

        k, m, n = 1, 16384, 64
        mk = rng.randn(k, m, 128).astype(np.float32) * 0.02
        q = rng.randn(n, 128).astype(np.float32)
        # Plant 60 strong matches for every query at stride C_BINS.
        hot = np.arange(60) * C_BINS + 7
        mk[0, hot] = q.mean(0) / np.linalg.norm(q.mean(0)) * 4.0 \
            + rng.randn(60, 128).astype(np.float32) * 0.05
        mv = rng.randn(k, m, 512).astype(np.float32)
        mk, mv, q = jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(q)
        exact = np.asarray(memory_read(mk, mv, q, top_k=50,
                                       backend="xla_exact"))
        full = np.asarray(memory_read(mk, mv, q, top_k=None))
        errs = []
        for nr in (0, 1, 2):
            out = np.asarray(memory_read_pallas(
                mk, mv, q, top_k=50, interpret=True, n_refine=nr))
            errs.append(np.abs(out - exact).mean())
        ef = np.abs(full - exact).mean()
        # Degradation is bounded and in the SAFE direction (widening
        # toward full softmax, never dropping true top-k mass)...
        assert errs[0] < 0.8 * ef, (errs, ef)
        # ...and each refine pass makes real progress back toward exact
        # (measured 0.061 -> 0.037 -> 0.029 vs full-softmax 0.114).
        assert errs[1] < 0.75 * errs[0], errs
        assert errs[2] < errs[1], errs

    def test_unaligned_shapes_are_padded(self, rng):
        """N and M not multiples of the tile sizes: wrapper pads and
        un-pads; padded memory slots never leak into the readout."""
        mk, mv, q = _peaky_inputs(rng, k=3, m=777, n=113)
        ref = memory_read(mk, mv, q, top_k=20, backend="xla_exact")
        out = memory_read_pallas(mk, mv, q, top_k=20, interpret=True)
        assert out.shape == (3, 113, 512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_dispatcher_routes_by_backend(self, rng):
        """memory_read(backend='auto') on the CPU test platform routes
        to XLA approx; explicit backends agree with each other."""
        mk, mv, q = _peaky_inputs(rng, k=1, m=600, n=100)
        auto = memory_read(mk, mv, q, top_k=30)
        approx = memory_read(mk, mv, q, top_k=30, backend="xla_approx")
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(approx))

    def test_refine_passes_tighten_toward_exact(self, rng):
        """The exact-count refine passes (`_refine_kernel`) shrink the
        threshold's bracket around the k-th affinity ~N_EDGES-fold per
        pass, so readout error vs the exact oracle must improve with
        n_refine on dense-boundary (iid Gaussian) spectra — the regime
        where the phase-A candidate-bin threshold is loosest."""
        k, m, n = 2, 2048, 256
        mk = jnp.asarray(rng.randn(k, m, 128).astype(np.float32))
        mv = jnp.asarray(rng.randn(k, m, 512).astype(np.float32))
        q = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        exact = np.asarray(memory_read(mk, mv, q, top_k=50,
                                       backend="xla_exact"))
        errs = []
        for nr in (0, 2):
            out = np.asarray(memory_read_pallas(
                mk, mv, q, top_k=50, interpret=True, n_refine=nr))
            errs.append(np.abs(out - exact).mean())
        # Two refine passes must cut the mean error at least 2x, and
        # refined support must stay a SUPERSET of exact top-k (readout
        # between exact-topk and full-softmax, never missing mass).
        assert errs[1] < 0.5 * errs[0], errs

    def test_large_magnitude_affinities_split_precision(self, rng):
        """Trained-encoder affinities have magnitude O(10) (the regime
        where one bf16 MXU pass loses ~0.1 nats and 10% weight error on
        real TPU). The split-precision `_affinity` path must track the
        fp32 exact oracle tightly at that magnitude."""
        k, m, n, ck = 1, 1024, 128, 128
        lat = rng.randn(8, ck).astype(np.float32)
        mk = jnp.asarray(rng.randn(k, m, 8).astype(np.float32) @ lat)
        mv = jnp.asarray(rng.randn(k, m, 512).astype(np.float32))
        q = jnp.asarray(rng.randn(n, 8).astype(np.float32) @ lat * 4.0)
        aff_scale = float(jnp.abs(
            q @ mk[0].T / np.sqrt(ck)).max())
        assert aff_scale > 8.0, aff_scale  # the intended regime
        ref = memory_read(mk, mv, q, top_k=50, backend="xla_exact")
        out = memory_read_pallas(mk, mv, q, top_k=50, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3)

    def test_bfloat16_bank_inputs(self, rng):
        """Production config: bf16 keys/values, fp32 statistics. The
        readout must stay within bf16 resolution of the fp32 exact
        read."""
        mk, mv, q = _peaky_inputs(rng, k=2, m=1200, n=160)
        ref = memory_read(mk, mv, q, top_k=20, backend="xla_exact")
        out = memory_read_pallas(mk.astype(jnp.bfloat16),
                                 mv.astype(jnp.bfloat16),
                                 q, top_k=20, interpret=True)
        assert out.dtype == jnp.float32
        err = np.abs(np.asarray(out) - np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        # bf16 keys carry ~0.4% relative affinity error which the exp
        # amplifies near the top-k boundary; this matches the precision
        # envelope of the reference's AMP fp16 inference path.
        assert err.max() / scale < 0.08, err.max() / scale
        assert err.mean() / scale < 5e-4, err.mean() / scale
