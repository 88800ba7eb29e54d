"""kNN vs brute-force numpy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from splatpu.neighbors.knn import knn


def test_knn_matches_numpy_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    idx, d2 = knn(jax.numpy.asarray(pts), k=5)
    idx, d2 = np.asarray(idx), np.asarray(d2)

    diff = pts[:, None] - pts[None]
    full = np.einsum("ijk,ijk->ij", diff, diff)
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :5]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=1)

    np.testing.assert_allclose(d2, ref_d2, atol=1e-3)
    # Indices may differ only at (near-)ties; compare distances per slot instead
    # of raw ids, then ids where the gap is unambiguous.
    gap = np.diff(ref_d2, axis=1)
    unambiguous = np.concatenate([gap > 1e-5, np.ones((300, 1), bool)], axis=1)
    assert (idx[unambiguous[:, :5]] == ref_idx[unambiguous[:, :5]]).mean() > 0.999


def test_knn_small_and_uneven_sizes():
    rng = np.random.default_rng(1)
    for n in [5, 17, 1025]:
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        idx, d2 = knn(jax.numpy.asarray(pts), k=3, chunk=16)
        assert idx.shape == (n, 3)
        assert (np.asarray(d2) >= 0).all()
        # No self matches.
        assert (np.asarray(idx) != np.arange(n)[:, None]).all()


def test_auto_chunk_respects_hbm_budget():
    from splatpu.neighbors.knn import _DIST_MATRIX_BUDGET_BYTES, _auto_chunk

    for n in (1_000, 100_000, 200_000, 500_000, 2_000_000):
        c = _auto_chunk(n)
        assert c % 8 == 0 or c == 8
        assert 8 <= c <= 1024
        if c > 8:
            assert c * n * 4 <= _DIST_MATRIX_BUDGET_BYTES
    assert _auto_chunk(1_000) == 1024
    assert _auto_chunk(500_000) <= 128


@pytest.mark.slow
def test_routing_decision_at_scale():
    """knn() must transparently route 200k+ points to the native KD-tree when
    available (no (chunk, N) HBM blowup) and match the brute-force result."""
    from splatpu.neighbors import native
    from splatpu.neighbors.knn import NATIVE_THRESHOLD, knn, knn_bruteforce

    if not native.available():
        import pytest

        pytest.skip("native kNN unavailable (no g++)")
    n = NATIVE_THRESHOLD + 8           # smallest routed size, keeps CI fast
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 3.0
    idx_r, d2_r = knn(jnp.asarray(pts), k=3)
    # Spot-check a subset against the device brute force.
    sub = rng.choice(n, size=256, replace=False)
    idx_b, d2_b = knn_bruteforce(jnp.asarray(pts), k=3, chunk=256)
    # The device path's |a|^2+|b|^2-2ab expansion differs from the KD-tree's
    # direct sum-of-squares by f32 cancellation (~1e-3 relative near zero).
    np.testing.assert_allclose(
        np.asarray(d2_r)[sub], np.asarray(d2_b)[sub], rtol=2e-3, atol=1e-5
    )
    assert (np.asarray(idx_r)[sub] == np.asarray(idx_b)[sub]).mean() > 0.999
