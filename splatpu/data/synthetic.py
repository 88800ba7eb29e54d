"""Procedural test scenes: random Gaussian clouds and look-at cameras.

These replace the reference's reliance on on-disk CMU-Panoptic captures for
exercising the pipeline (the reference has no synthetic/test path at all,
SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import Camera, GaussianCloud, cloud_from_arrays


def make_random_cloud(
    key,
    n: int,
    capacity: int | None = None,
    center=(0.0, 0.0, 0.0),
    extent: float = 1.0,
    scale_range=(0.02, 0.08),
    fg_fraction: float = 0.7,
) -> GaussianCloud:
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(
        ks[0], (n, 3), minval=-extent, maxval=extent
    ) + jnp.asarray(center)
    colors = jax.random.uniform(ks[1], (n, 3))
    quats = jax.random.normal(ks[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opacity_logits = jax.random.uniform(ks[3], (n, 1), minval=-1.0, maxval=3.0)
    log_scales = jnp.log(
        jax.random.uniform(
            ks[4], (n, 3), minval=scale_range[0], maxval=scale_range[1]
        )
    )
    fg = (jax.random.uniform(ks[5], (n,)) < fg_fraction).astype(jnp.float32)
    seg = jnp.stack([fg, jnp.zeros_like(fg), 1.0 - fg], axis=-1)
    return cloud_from_arrays(
        means=means,
        colors=colors,
        segmentation_masks=seg,
        rotation_quaternions=quats,
        opacity_logits=opacity_logits,
        log_scales=log_scales,
        capacity=capacity,
    )


def make_lookat_camera(
    eye=(0.0, 0.0, -4.0),
    target=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
    width: int = 64,
    height: int = 64,
    focal: float | None = None,
) -> Camera:
    """Standard look-at extrinsics (camera +z toward target) + centered pinhole."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    # Rows of R are the camera axes expressed in world coordinates.
    R = np.stack([right, true_up, fwd])
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    if focal is None:
        focal = 0.8 * max(width, height)
    K = np.array(
        [[focal, 0.0, width / 2.0], [0.0, focal, height / 2.0], [0.0, 0.0, 1.0]]
    )
    return Camera(
        w2c=jnp.asarray(w2c, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        width=width,
        height=height,
    )
