"""kNN vs brute-force numpy (SURVEY.md §4)."""

import jax
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
