"""State normalization/encoding and deformation application.

Reference semantics:
- `normalize_and_encode_means_and_rotations` (`train.py:185-204`): per-axis
  min-max normalize means and quats to [-1, 1], then PE10 / PE4, concat -> (N, 92).
- `update_gaussian_cloud_parameters` (`train.py:269-308`): progress = t/T,
  PE4-encoded and tiled to N rows; network delta split 3/4; means += 0.01 *
  delta_means, quats += 0.01 * delta_quats.  Note the **double residual**: the
  network output already added `initial_means_and_rotations` (`train.py:108`),
  so the effective update is initial + 0.01 * (raw_net_output + initial); we
  preserve this exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splatpu.core.encoding import positional_encoding
from splatpu.core.types import GaussianCloud
from splatpu.dynamics.network import DeformationNetConfig, deformation_net_apply

DEFORMATION_DELTA_SCALE = 0.01  # `train.py:303,307`
MEANS_FREQUENCIES = 10          # `train.py:200`
ROTATION_FREQUENCIES = 4        # `train.py:201`
PROGRESS_FREQUENCIES = 4        # `train.py:277`


def _minmax_normalize(x, mask=None):
    """x - min, then 2*x/max(shifted) - 1, per axis (`train.py:190-197`).

    With a mask, statistics come from masked rows only (fixed-capacity padding
    must not pollute the range); masked-out rows still get *some* value, which
    is fine — they are dead everywhere downstream.
    """
    if mask is None:
        lo = jnp.min(x, axis=0)
        shifted = x - lo
        hi = jnp.max(shifted, axis=0)
    else:
        big = jnp.float32(3e38)
        m = mask[:, None]
        lo = jnp.min(jnp.where(m, x, big), axis=0)
        shifted = x - lo
        hi = jnp.max(jnp.where(m, shifted, -big), axis=0)
    return 2.0 * shifted / hi - 1.0


def normalize_and_encode_means_and_rotations(
    means, rotations, mask=None, quirk_compat: bool = True
):
    enc_means = positional_encoding(
        _minmax_normalize(means, mask), MEANS_FREQUENCIES, quirk_compat
    )
    enc_rots = positional_encoding(
        _minmax_normalize(rotations, mask), ROTATION_FREQUENCIES, quirk_compat
    )
    return jnp.concatenate([enc_means, enc_rots], axis=1)


def encode_progress(timestep, timestep_count, n, quirk_compat: bool = True):
    progress = jnp.asarray(timestep, jnp.float32) / timestep_count
    enc = positional_encoding(
        jnp.full((1, 1), 0.0) + progress, PROGRESS_FREQUENCIES, quirk_compat
    )  # (1, 8)
    return jnp.broadcast_to(enc, (n, enc.shape[1]))


def update_cloud_parameters(
    net_params,
    initial_cloud: GaussianCloud,
    encoded_initial,
    encoded_previous,
    timestep,
    timestep_count: int,
    config: DeformationNetConfig,
    quirk_compat: bool = True,
) -> GaussianCloud:
    """Apply the deformation network for one timestep (`train.py:269-308`)."""
    n = initial_cloud.capacity
    initial_mr = jnp.concatenate(
        [initial_cloud.means, initial_cloud.rotation_quaternions], axis=1
    )
    delta = deformation_net_apply(
        net_params,
        initial_mr,
        encoded_initial,
        encoded_previous,
        encode_progress(timestep, timestep_count, n, quirk_compat),
        config,
    )
    scale = config.delta_scale  # DEFORMATION_DELTA_SCALE unless deviating
    return initial_cloud.replace(
        means=initial_cloud.means + scale * delta[:, :3],
        rotation_quaternions=initial_cloud.rotation_quaternions
        + scale * delta[:, 3:],
    )
