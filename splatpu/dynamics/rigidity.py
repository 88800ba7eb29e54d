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

import jax
import jax.numpy as jnp
from flax import struct

from splatpu.core.quaternion import build_rotation, quat_conjugate, quat_mult, quat_normalize
from splatpu.neighbors.knn import knn

RIGIDITY_WEIGHT_TEMPERATURE = 2000.0  # `train.py:177`
RIGIDITY_K = 20                       # `train.py:172`


@struct.dataclass
class NeighborInfo:
    """`train.py:45-48`; indices index into the *foreground subset*."""

    indices: jax.Array  # (F, k) int32
    weights: jax.Array  # (F, k) float32


@struct.dataclass
class ForegroundInfo:
    """Previous-timestep snapshot (`train.py:51-54`), detached."""

    inverted_rotations: jax.Array    # (F, 4)
    offsets_to_neighbors: jax.Array  # (F, k, 3)


def build_neighbor_info(foreground_means, k: int = RIGIDITY_K) -> NeighborInfo:
    idx, d2 = knn(foreground_means, k)
    return NeighborInfo(
        indices=idx,
        weights=jnp.exp(-RIGIDITY_WEIGHT_TEMPERATURE * d2),
    )


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
    offsets = fg_means[neighbor_info.indices] - fg_means[:, None]  # (F, k, 3)
    # R^T @ offset for each neighbor: (F, 1, 3, 3)^T x (F, k, 3)
    in_prev = jnp.einsum("fij,fki->fkj", rel, offsets)
    return weighted_l2_loss_v2(
        in_prev, previous.offsets_to_neighbors, neighbor_info.weights
    )
