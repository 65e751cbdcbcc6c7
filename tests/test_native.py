import numpy as np
import pytest

from robosimgs_tpu.core.types import _knn_mean_dist
from robosimgs_tpu.native import has_native, knn_mean_dist


def test_native_builds_and_loads():
    assert has_native(), "native knn library failed to build/load"


@pytest.mark.parametrize("n", [10, 500, 3000])
def test_knn_matches_bruteforce(n, rng):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    ref = _knn_mean_dist(pts, k=3)
    fast = knn_mean_dist(pts, k=3)
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-6)


def test_knn_degenerate_planar(rng):
    pts = rng.normal(size=(800, 3)).astype(np.float32)
    pts[:, 2] = 0.0  # planar cloud: grid capping path
    ref = _knn_mean_dist(pts, k=3)
    fast = knn_mean_dist(pts, k=3)
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-6)


def test_knn_large_is_fast(rng):
    import time

    pts = rng.normal(size=(200_000, 3)).astype(np.float32)
    t0 = time.time()
    out = knn_mean_dist(pts, k=3)
    dt = time.time() - t0
    assert out.shape == (200_000,)
    assert (out > 0).all() and np.isfinite(out).all()
    assert dt < 10.0, f"native knn too slow: {dt:.1f}s"


def test_knn_tiny():
    assert knn_mean_dist(np.zeros((1, 3), np.float32)).shape == (1,)
    out = knn_mean_dist(np.array([[0, 0, 0], [1, 0, 0]], np.float32), k=3)
    np.testing.assert_allclose(out, [1.0, 1.0], atol=1e-6)
