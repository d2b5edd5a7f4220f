"""Native C++ components: click distance transform (ctypes-bound)."""
import numpy as np
import pytest

from mivos_tpu.ops.native_distmaps import (_fallback, get_dist_maps,
                                           native_available)


def _brute(points, h, w, norm):
    return _fallback(np.asarray(points, np.float32), h, w, norm)


class TestNativeDistMaps:
    def test_builds_and_loads(self):
        assert native_available(), "native build failed (g++ required)"

    def test_matches_exact_small_n(self, rng):
        h, w = 40, 56
        pts = np.asarray([[5, 7], [20, 30], [-1, -1],
                          [10, 50], [35, 3], [-1, -1]], np.float32)
        out = get_dist_maps(pts, h, w, norm_delimiter=2.0)
        ref = _brute(pts, h, w, 2.0)
        assert out.shape == (2, h, w)
        np.testing.assert_allclose(out, ref, rtol=1e-5)
        # click pixels are exactly zero
        assert out[0, 5, 7] == 0 and out[1, 10, 50] == 0

    def test_bfs_path_large_n_close_to_exact(self, rng):
        """>64 clicks switches to the origin-carrying BFS; it must stay
        within a small relative error of exact euclidean (BFS explores
        4-neighborhoods, so some origins are shadowed)."""
        h, w = 64, 64
        n = 80
        pts = np.stack([rng.randint(0, h, 2 * n),
                        rng.randint(0, w, 2 * n)], 1).astype(np.float32)
        out = get_dist_maps(pts, h, w, norm_delimiter=1.0)
        ref = _brute(pts, h, w, 1.0)
        # BFS over-estimates only where a closer click is shadowed
        assert (out + 1e-5 >= ref).all()
        err = np.abs(np.sqrt(out) - np.sqrt(ref))
        assert np.median(err) < 0.5, np.median(err)

    def test_empty_points(self):
        out = get_dist_maps(np.zeros((0, 2), np.float32), 8, 8, 1.0)
        assert (out == 1e6).all()

    def test_all_padding(self):
        pts = np.full((4, 2), -1.0, np.float32)
        out = get_dist_maps(pts, 8, 8, 1.0)
        assert (out == 1e6).all()
