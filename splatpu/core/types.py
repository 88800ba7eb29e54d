"""Core pytree types: Gaussian cloud (fixed-capacity SoA), cameras, render args.

TPU-first design notes
----------------------
The reference keeps the Gaussian cloud as a dict of torch Parameters whose leading
dimension N changes every densification step (reference `densify.py:22-57`,
`external.py:127-314`).  Dynamic shapes would force an XLA recompile at every
clone/split/prune, so here the cloud is a **fixed-capacity structure-of-arrays**:
every array has leading dimension ``capacity`` (static), and an ``alive`` mask
plus scatter/compaction updates (see `splatpu.growth`) replace torch's tensor
reallocation.  Dead slots render with opacity 0 and are excluded from binning.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaussianCloud:
    """Fixed-capacity Gaussian cloud parameters (raw, pre-activation).

    Mirrors the parameter dict built at reference `densify.py:29-57`:
    means / colors / segmentation_masks / rotation_quaternions / opacity_logits /
    log_scales.  (The reference's unused ``camera_matrices`` / ``camera_center``
    parameters — lr 1e-4 but excluded from both rendering and densification,
    `densify.py:54-55`, `external.py:180,237` — are deliberately dropped.)

    All arrays have leading dim = capacity; ``alive`` marks the occupied slots.
    """

    means: jax.Array              # (CAP, 3) float32
    colors: jax.Array             # (CAP, 3) float32
    segmentation_masks: jax.Array  # (CAP, 3) float32, channels (fg, 0, bg)
    rotation_quaternions: jax.Array  # (CAP, 4) float32 (w, x, y, z)
    opacity_logits: jax.Array     # (CAP, 1) float32
    log_scales: jax.Array         # (CAP, 3) float32
    alive: jax.Array              # (CAP,) bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def param_dict(self) -> dict[str, jax.Array]:
        """The trainable parameter subtree (everything except the alive mask)."""
        return {
            "means": self.means,
            "colors": self.colors,
            "segmentation_masks": self.segmentation_masks,
            "rotation_quaternions": self.rotation_quaternions,
            "opacity_logits": self.opacity_logits,
            "log_scales": self.log_scales,
        }

    def replace_params(self, params: dict[str, jax.Array]) -> "GaussianCloud":
        return self.replace(**params)


def cloud_from_arrays(
    means,
    colors,
    segmentation_masks,
    rotation_quaternions,
    opacity_logits,
    log_scales,
    capacity: Optional[int] = None,
) -> GaussianCloud:
    """Build a cloud from dense (N, ·) arrays, padding up to ``capacity``.

    Padding slots are dead (alive=False), with benign values (identity quats,
    tiny scales) so activations stay finite.
    """
    means = jnp.asarray(means, jnp.float32)
    n = means.shape[0]
    cap = capacity if capacity is not None else n
    if cap < n:
        raise ValueError(f"capacity {cap} < point count {n}")

    def pad(x, fill):
        x = jnp.asarray(x, jnp.float32)
        if cap == n:
            return x
        pad_block = jnp.full((cap - n,) + x.shape[1:], fill, jnp.float32)
        return jnp.concatenate([x, pad_block], axis=0)

    quats = jnp.asarray(rotation_quaternions, jnp.float32)
    pad_quats = jnp.zeros((cap - n, 4), jnp.float32).at[:, 0].set(1.0)
    quats = jnp.concatenate([quats, pad_quats], axis=0) if cap > n else quats
    return GaussianCloud(
        means=pad(means, 0.0),
        colors=pad(colors, 0.0),
        segmentation_masks=pad(segmentation_masks, 0.0),
        rotation_quaternions=quats,
        opacity_logits=pad(opacity_logits, -20.0),
        log_scales=pad(log_scales, -10.0),
        alive=jnp.arange(cap) < n,
    )


@struct.dataclass
class Camera:
    """A pinhole camera: world-to-camera extrinsics + intrinsics + image size.

    Replaces the reference's ``GaussianRasterizationSettings`` NamedTuple
    (`shared.py:112-124`): rather than carrying precomposed row-major-transposed
    view/projection matrices the way the CUDA kernel wants them, we keep the
    raw (w2c, K) and derive projection quantities on the fly (they are traced
    once under jit and fuse into the preprocess kernel anyway).
    """

    w2c: jax.Array  # (4, 4) world->camera, x_cam = w2c[:3,:3] @ x + w2c[:3,3]
    K: jax.Array    # (3, 3) intrinsics [[fx,0,cx],[0,fy,cy],[0,0,1]]
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    near: float = struct.field(pytree_node=False, default=1.0)
    far: float = struct.field(pytree_node=False, default=100.0)
    # FOV overrides for sub-image (strip) rendering: the EWA frustum clamp
    # must use the FULL image's field of view, not the strip's, for strip
    # renders to be bit-identical with full renders (see dist/tile_sharding).
    fov_width: Optional[int] = struct.field(pytree_node=False, default=None)
    fov_height: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @property
    def tan_fovx(self):
        return (self.fov_width or self.width) / (2.0 * self.fx)

    @property
    def tan_fovy(self):
        return (self.fov_height or self.height) / (2.0 * self.fy)

    def campos(self):
        """Camera center in world coords = -R^T t (reference `shared.py:79`)."""
        R = self.w2c[:3, :3]
        t = self.w2c[:3, 3]
        return -R.T @ t

    def batchable(self) -> "Camera":
        """Cameras with equal (width, height, near, far) can be stacked/vmapped
        over their (w2c, K) leaves."""
        return self


def stack_cameras(cameras: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree (leading axis
    on w2c and K) for vmap/shard_map over views."""
    if not cameras:
        raise ValueError("empty camera list")
    c0 = cameras[0]
    for c in cameras[1:]:
        if (c.width, c.height, c.near, c.far) != (c0.width, c0.height, c0.near, c0.far):
            raise ValueError("cannot stack cameras with differing static fields")
    return Camera(
        w2c=jnp.stack([c.w2c for c in cameras]),
        K=jnp.stack([c.K for c in cameras]),
        width=c0.width,
        height=c0.height,
        near=c0.near,
        far=c0.far,
    )


@struct.dataclass
class RenderArgs:
    """Activated per-Gaussian quantities consumed by the rasterizer.

    The analog of the reference's ``create_render_arguments`` output
    (`shared.py:29-42`): rotations L2-normalized, opacities sigmoid'd, scales
    exp'd; ``means2d_offset`` plays the role of the reference's zero `means2D`
    dummy tensor — an additive zero in NDC units whose cotangent carries the
    per-Gaussian screen-space gradient used by densification
    (`external.py:113-124`).
    """

    means3d: jax.Array        # (N, 3)
    colors: jax.Array         # (N, C) — "colors_precomp"; any per-Gaussian vector
    rotations: jax.Array      # (N, 4) unit quaternions
    opacities: jax.Array      # (N, 1) in [0, 1]
    scales: jax.Array         # (N, 3) positive
    means2d_offset: jax.Array  # (N, 2) zeros; NDC-space gradient collector

    @property
    def n(self) -> int:
        return self.means3d.shape[0]


def activate_cloud(cloud: GaussianCloud, colors: Optional[jax.Array] = None) -> RenderArgs:
    """`shared.py:29-42` semantics on a fixed-capacity cloud: dead slots get
    opacity 0 so they contribute nothing (and receive zero gradients)."""
    from splatpu.core.quaternion import quat_normalize

    opacity = jax.nn.sigmoid(cloud.opacity_logits)
    opacity = jnp.where(cloud.alive[:, None], opacity, 0.0)
    return RenderArgs(
        means3d=cloud.means,
        colors=cloud.colors if colors is None else colors,
        rotations=quat_normalize(cloud.rotation_quaternions),
        opacities=opacity,
        scales=jnp.exp(cloud.log_scales),
        means2d_offset=jnp.zeros((cloud.capacity, 2), jnp.float32),
    )
