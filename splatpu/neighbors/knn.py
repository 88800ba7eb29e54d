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


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(points: jax.Array, k: int, chunk: int = 1024):
    """Exact self-kNN over (N, 3) points, excluding each point itself.

    Returns (indices, squared_distances), both (N, k), neighbors sorted by
    ascending distance — the same contract as `shared.py:45-61`.
    """
    n = points.shape[0]
    if k > n - 1:
        # Fewer points than requested neighbors: return the n-1 real ones and
        # pad with index 0 / infinite distance (downstream weights vanish).
        idx, d2 = knn(points, k=max(n - 1, 1), chunk=chunk)
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
