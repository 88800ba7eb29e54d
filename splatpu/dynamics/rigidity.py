"""Local-rigidity regularizer over the foreground k-NN graph.

Reference semantics (`train.py:45-54, 166-182, 220-266, 311-351`):

- foreground = segmentation channel 0 > 0.5; the foreground **index set is
  fixed** for all of stage 2 (deformation only moves means/quats), so we
  resolve it once to a static index array — keeping every per-step computation
  static-shape for jit.
- neighbor graph: k=20 exact NN over initial foreground means, weights
  exp(-2000 * d^2)  (`train.py:172,177`).
- per step, the "previous frame" snapshot stores conjugated (inverted)
  normalized foreground quats + offsets to neighbors (detached).
- rigidity loss: rotate current offsets into the previous frame's local frames
  via R(q_cur x q_prev^-1)^T and compare to previous offsets with
  weighted_l2_loss_v2 = mean(sqrt(sum((x-y)^2, -1) * w + 1e-20)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from splatpu.core.quaternion import build_rotation, quat_conjugate, quat_mult, quat_normalize
from splatpu.neighbors.knn import knn

RIGIDITY_WEIGHT_TEMPERATURE = 2000.0  # `train.py:177`
RIGIDITY_K = 20                       # `train.py:172`


@struct.dataclass
class NeighborInfo:
    """`train.py:45-48`; indices index into the *foreground subset*.

    `inv_order`/`inv_bounds` are the precomputed inverse routing of the
    neighbor gather (static per graph): flat emission positions sorted by
    target index, plus per-target segment bounds.  They let the gather's
    gradient transpose run as gather + cumsum + boundary-diff instead of an
    XLA scatter-add (slow on TPU)."""

    indices: jax.Array     # (F, k) int32
    weights: jax.Array     # (F, k) float32
    inv_order: jax.Array   # (F*k,) int32 — flat positions grouped by target
    inv_bounds: jax.Array  # (F+1,) int32 — segment bounds per target


@struct.dataclass
class ForegroundInfo:
    """Previous-timestep snapshot (`train.py:51-54`), detached."""

    inverted_rotations: jax.Array    # (F, 4)
    offsets_to_neighbors: jax.Array  # (F, k, 3)


def build_neighbor_info(foreground_means, k: int = RIGIDITY_K) -> NeighborInfo:
    idx, d2 = knn(foreground_means, k)
    f = idx.shape[0]
    flat = idx.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(flat).astype(jnp.int32)
    bounds = jnp.searchsorted(
        flat[order], jnp.arange(f + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return NeighborInfo(
        indices=idx,
        weights=jnp.exp(-RIGIDITY_WEIGHT_TEMPERATURE * d2),
        inv_order=order,
        inv_bounds=bounds,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _neighbor_gather(x, indices, inv_order, inv_bounds):
    """x[indices] with a scatter-free gradient transpose."""
    return x[indices]


def _neighbor_gather_fwd(x, indices, inv_order, inv_bounds):
    return x[indices], (indices, inv_order, inv_bounds, x.shape)


def _neighbor_gather_bwd(res, g):
    indices, inv_order, inv_bounds, x_shape = res
    f, k = indices.shape
    flat = g.reshape(f * k, -1)
    # Segment sums per target: gather into target-grouped order, cumsum,
    # boundary differences (empty segments produce 0).
    grouped = flat[inv_order]
    csum = jnp.cumsum(grouped, axis=0)
    hi = jnp.clip(inv_bounds[1:] - 1, 0, f * k - 1)
    lo = inv_bounds[:-1] - 1
    hi_v = csum[hi]
    lo_v = jnp.where((lo >= 0)[:, None], csum[jnp.clip(lo, 0, f * k - 1)], 0.0)
    nonempty = (inv_bounds[1:] > inv_bounds[:-1])[:, None]
    dx = jnp.where(nonempty, hi_v - lo_v, 0.0).reshape(x_shape)
    return dx, None, None, None


_neighbor_gather.defvjp(_neighbor_gather_fwd, _neighbor_gather_bwd)


def foreground_info(
    fg_means, fg_rotations_raw, neighbor_indices
) -> ForegroundInfo:
    """Snapshot current foreground state as the next step's "previous" frame
    (`train.py:228-248`); detached like the reference's .detach().clone()."""
    rot = quat_normalize(fg_rotations_raw, eps=1e-12)
    offsets = fg_means[neighbor_indices] - fg_means[:, None]
    return ForegroundInfo(
        inverted_rotations=jax.lax.stop_gradient(quat_conjugate(rot)),
        offsets_to_neighbors=jax.lax.stop_gradient(offsets),
    )


def weighted_l2_loss_v2(x, y, w):
    """`train.py:321-322` (note: eps inside the sqrt)."""
    return jnp.mean(jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1) * w + 1e-20))


def rigidity_loss(
    fg_means,                 # (F, 3) current foreground means (differentiable)
    fg_rotations_raw,         # (F, 4) current raw foreground quaternions
    neighbor_info: NeighborInfo,
    previous: ForegroundInfo,
):
    """`train.py:325-351`."""
    cur_rot = quat_normalize(fg_rotations_raw, eps=1e-12)
    rel = build_rotation(
        quat_mult(cur_rot, previous.inverted_rotations), eps=1e-12
    )  # (F, 3, 3): rotation from previous frame to current
    offsets = _neighbor_gather(
        fg_means, neighbor_info.indices,
        neighbor_info.inv_order, neighbor_info.inv_bounds,
    ) - fg_means[:, None]  # (F, k, 3)
    # R^T @ offset for each neighbor: (F, 1, 3, 3)^T x (F, k, 3)
    in_prev = jnp.einsum("fij,fki->fkj", rel, offsets)
    return weighted_l2_loss_v2(
        in_prev, previous.offsets_to_neighbors, neighbor_info.weights
    )
