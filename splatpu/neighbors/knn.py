"""Exact k-nearest-neighbors, TPU-native.

Replaces the reference's Open3D KDTreeFlann with a per-point Python query loop
(`shared.py:45-61` — O(N) host-side tree queries).  On TPU the right tool is a
chunked brute-force: squared distances via one (chunk, N) matmul on the MXU
(|a-b|^2 = |a|^2 + |b|^2 - 2 a.b), then `top_k`.  Exact, O(N^2) FLOPs but
memory-bounded at chunk*N, and ~trivially fast for the N <= a few 100k this
workload sees (used with k=3 at `densify.py:26-27`, k=20 at `train.py:169-173`).

A C++ KD-tree (splatpu/native) can serve large host-side queries; this module
is the always-available device path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# HBM budget for the (chunk, N) distance matrix of the brute-force path;
# keeps the kNN footprint far below the render buffers at 500k+ points
# (a fixed chunk=1024 would materialize 2 GB+ per scan step at that scale).
_DIST_MATRIX_BUDGET_BYTES = 256 << 20
# Above this N, host-side queries route to the native C++ KD-tree when it is
# available: O(N log N) build + O(N k log N) queries beat the O(N^2) MXU
# sweep on wall-clock from roughly this scale (and cost no HBM at all).
NATIVE_THRESHOLD = 200_000


def _auto_chunk(n: int) -> int:
    rows = _DIST_MATRIX_BUDGET_BYTES // max(4 * n, 1)
    return int(max(8, min(1024, (rows // 8) * 8)))


def knn(points, k: int, chunk: int | None = None):
    """Exact self-kNN over (N, 3) points, excluding each point itself.

    Returns (indices, squared_distances), both (N, k), neighbors sorted by
    ascending distance — the same contract as `shared.py:45-61`.

    Transparent routing (host callers only; inside a trace use
    `knn_bruteforce` directly): concrete inputs above `NATIVE_THRESHOLD`
    points go to the native C++ KD-tree when available; everything else uses
    the MXU brute force with the chunk size clamped to the HBM budget.
    """
    n = points.shape[0]
    if chunk is None:
        chunk = _auto_chunk(n)
    concrete = not isinstance(points, jax.core.Tracer)
    if concrete and n > NATIVE_THRESHOLD:
        from splatpu.neighbors import native

        if native.available():
            import numpy as np

            idx, d2 = native.knn_native(np.asarray(points), k=min(k, n - 1))
            idx = jnp.asarray(idx)
            d2 = jnp.asarray(d2)
            if k > n - 1:  # pad like the device path
                pad = k - idx.shape[1]
                idx = jnp.pad(idx, ((0, 0), (0, pad)))
                d2 = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
            return idx, d2
    return knn_bruteforce(points, k=k, chunk=chunk)


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_bruteforce(points: jax.Array, k: int, chunk: int = 1024):
    """Chunked MXU brute-force self-kNN (see module docstring)."""
    n = points.shape[0]
    if k > n - 1:
        # Fewer points than requested neighbors: return the n-1 real ones and
        # pad with index 0 / infinite distance (downstream weights vanish).
        idx, d2 = knn_bruteforce(points, k=max(n - 1, 1), chunk=chunk)
        pad = k - idx.shape[1]
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        d2 = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
        return idx, d2
    pts = points.astype(jnp.float32)
    sq_norm = jnp.sum(pts * pts, axis=-1)  # (N,)

    pad = (-n) % chunk
    padded = jnp.pad(pts, ((0, pad), (0, 0)))
    num_chunks = padded.shape[0] // chunk

    def body(carry, i):
        q = jax.lax.dynamic_slice_in_dim(padded, i * chunk, chunk)  # (chunk, 3)
        qn = jnp.sum(q * q, axis=-1)
        # precision=HIGHEST keeps the MXU in multi-pass f32 mode; the default
        # bf16 matmul loses ~1e-3 relative accuracy, which corrupts neighbor
        # ordering at small separations.
        cross = jnp.dot(q, pts.T, precision=jax.lax.Precision.HIGHEST)
        d2 = qn[:, None] + sq_norm[None, :] - 2.0 * cross  # (chunk, N)
        row = i * chunk + jnp.arange(chunk)
        # Exclude self-matches by index (not by zero distance, so duplicate
        # points still return their twin as a neighbor, like a KD-tree does).
        is_self = row[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(is_self, jnp.inf, d2)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return carry, (idx, -neg_d)

    _, (idx, d2) = jax.lax.scan(body, None, jnp.arange(num_chunks))
    idx = idx.reshape(-1, k)[:n]
    d2 = jnp.maximum(d2.reshape(-1, k)[:n], 0.0)
    return idx, d2
