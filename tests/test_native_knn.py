"""Native C++ KD-tree kNN vs numpy brute force and the device path."""

import numpy as np
import pytest

from splatpu.neighbors import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native kNN library unavailable (no g++?)")


def test_self_knn_matches_bruteforce(lib_available):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    idx, d2 = native.knn_native(pts, k=7)

    diff = pts[:, None] - pts[None]
    full = np.einsum("ijk,ijk->ij", diff, diff)
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :7]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(d2, ref_d2, rtol=1e-5, atol=1e-6)


def test_query_knn(lib_available):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(40, 3)).astype(np.float32)
    idx, d2 = native.knn_query_native(pts, q, k=4)
    diff = q[:, None] - pts[None]
    full = np.einsum("ijk,ijk->ij", diff, diff)
    ref_idx = np.argsort(full, axis=1)[:, :4]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(d2, ref_d2, rtol=1e-5, atol=1e-6)


def test_small_cloud_padding(lib_available):
    pts = np.zeros((3, 3), np.float32)
    pts[1] = [1, 0, 0]
    pts[2] = [2, 0, 0]
    idx, d2 = native.knn_native(pts, k=5)
    assert idx.shape == (3, 5)
    # Only 2 real neighbors exist; the rest are -1/inf sentinels.
    assert (idx[:, 2:] == -1).all()
    assert np.isinf(d2[:, 2:]).all()
    assert d2[0, 0] == pytest.approx(1.0)
