"""Tile-axis sharding: one large render split across devices by image rows.

The intra-image analog of camera sharding (SURVEY.md §5.7): each device on the
``tiles`` mesh axis renders a horizontal strip of the image.  A strip is just
a smaller camera with the same intrinsics and a shifted principal point —
cy' = cy - strip_row0 — so no new renderer machinery is needed; Gaussians are
replicated and each device bins only the tiles it owns (its strip).

Strips align to the 16-pixel tile grid.  Output strips are concatenated along
the row axis by the shard_map out-spec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from splatpu.core.types import Camera, RenderArgs
from splatpu.render.api import render, render_dual
from splatpu.render.binning import DEFAULT_TILE, TILE


def strip_height(height: int, n_shards: int, tile: int = DEFAULT_TILE) -> int:
    """Rows per shard: tile-aligned, covering the (padded) image."""
    tiles_y = -(-height // tile)
    tiles_per_shard = -(-tiles_y // n_shards)
    return tiles_per_shard * tile


def make_tile_sharded_render(
    mesh: Mesh, camera: Camera, renderer: str = "auto", binning=None, axis: str = "tiles"
):
    """Returns render_strips(args, w2c, K) -> (C, H_pad, W) image sharded over
    the ``axis`` mesh axis (caller crops to camera.height)."""
    n = mesh.shape[axis]
    sh = strip_height(camera.height, n, binning.tile if binning else DEFAULT_TILE)

    strip_camera = Camera(
        w2c=camera.w2c,
        K=camera.K,
        width=camera.width,
        height=sh,
        near=camera.near,
        far=camera.far,
        # Keep the FULL image's FOV for the EWA frustum clamp so strips are
        # bit-identical with the corresponding rows of a full render.
        fov_width=camera.fov_width or camera.width,
        fov_height=camera.fov_height or camera.height,
    )

    def local(args: RenderArgs, w2c, K):
        row0 = jax.lax.axis_index(axis) * sh
        # Shift the principal point so this strip's pixel (0,0) is image-row
        # row0: cy' = cy - row0.
        K_strip = K.at[1, 2].add(-row0.astype(K.dtype))
        cam = strip_camera.replace(w2c=w2c, K=K_strip)
        out = render(args, cam, impl=renderer, config=binning)
        return out.image  # (C, sh, W)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )


def _strip_camera(camera: Camera, sh: int) -> Camera:
    return Camera(
        w2c=camera.w2c,
        K=camera.K,
        width=camera.width,
        height=sh,
        near=camera.near,
        far=camera.far,
        # Keep the FULL image's FOV for the EWA frustum clamp so strips are
        # bit-identical with the corresponding rows of a full render.
        fov_width=camera.fov_width or camera.width,
        fov_height=camera.fov_height or camera.height,
    )


def make_tile_sharded_render_dual(
    mesh: Mesh, camera: Camera, renderer: str = "auto", binning=None,
    axis: str = "tiles",
):
    """Strip-sharded `render_dual` for the stage-1 dual (image + segmentation)
    loss: each device bins + composites only its image strip, for BOTH
    composites, over one shared per-strip preprocess.

    Returns dual_strips(args, colors_b, w2c, K) ->
    (image (C, H_pad, W), seg_image (C, H_pad, W), radii (N,), overflow (),
    span_overflow ()):
    images sharded over ``axis`` (caller crops rows to camera.height), radii
    identical on every strip (the EWA radius does not depend on the principal
    point), overflow pmax'd over strips.  Gradients to the replicated `args`
    (including the `means2d_offset` densification collector) are psum'd over
    strips by the shard_map transpose — the sum of per-strip screen gradients
    IS the full-image gradient.
    """
    n = mesh.shape[axis]
    sh = strip_height(camera.height, n, binning.tile if binning else DEFAULT_TILE)
    strip_cam = _strip_camera(camera, sh)

    def local(args: RenderArgs, colors_b, w2c, K):
        row0 = jax.lax.axis_index(axis) * sh
        K_strip = K.at[1, 2].add(-row0.astype(K.dtype))
        cam = strip_cam.replace(w2c=w2c, K=K_strip)
        out_a, out_b = render_dual(
            args, colors_b, cam, impl=renderer, config=binning
        )
        overflow = jax.lax.pmax(
            jax.lax.stop_gradient(
                (out_a.overflowed | out_b.overflowed).astype(jnp.float32)
            ),
            axis,
        )
        span = jax.lax.pmax(
            jax.lax.stop_gradient(
                (out_a.span_overflowed | out_b.span_overflowed).astype(
                    jnp.float32
                )
            ),
            axis,
        )
        radii = jax.lax.pmax(jax.lax.stop_gradient(out_a.radii), axis)
        return out_a.image, out_b.image, radii, overflow, span

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None), P(), P(), P()),
        check_vma=False,
    )
