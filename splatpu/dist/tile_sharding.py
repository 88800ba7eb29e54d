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
from jax.experimental.shard_map import shard_map

from splatpu.core.types import Camera, RenderArgs
from splatpu.render.api import render
from splatpu.render.binning import TILE


def strip_height(height: int, n_shards: int) -> int:
    """Rows per shard: tile-aligned, covering the (padded) image."""
    tiles_y = -(-height // TILE)
    tiles_per_shard = -(-tiles_y // n_shards)
    return tiles_per_shard * TILE


def make_tile_sharded_render(
    mesh: Mesh, camera: Camera, renderer: str = "auto", binning=None, axis: str = "tiles"
):
    """Returns render_strips(args, w2c, K) -> (C, H_pad, W) image sharded over
    the ``axis`` mesh axis (caller crops to camera.height)."""
    n = mesh.shape[axis]
    sh = strip_height(camera.height, n)

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
        check_rep=False,
    )
