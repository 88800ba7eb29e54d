"""Pair-stream tile compositor (pure XLA, differentiable via scan + remat).

Consumes the depth-sorted, tile-segmented `PairStream` from `binning.py` and
composites it in fixed-size chunks. Unlike the CUDA render kernel — one thread
block per tile, serial front-to-back loop with early break (SURVEY.md §2.1
step 3) — this formulation is *pair-parallel*: every chunk of 1024 pairs is
evaluated against its own tiles' 256 pixels as dense (chunk, 256) vector math,
with per-(tile, pixel) transmittance and termination state carried across
chunks in log space.  Exact serial-termination semantics are recovered
algebraically:

- T_excl(pair) = T_in(tile) * exp(segmented-exclusive-cumsum log(1 - alpha)),
- a pair "fails" when T_excl*(1-alpha) < 1e-4; failure is sticky per
  (tile, pixel) and the failing pair itself does not composite (matching the
  CUDA `test_T < 1e-4 -> done` rule exactly — see render/oracle.py).

This path runs everywhere (CPU tests, multichip dry-runs) and is the autodiff
reference for the Pallas kernels, which consume the same PairStream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splatpu.core.projection import TRANSMITTANCE_EPS
from splatpu.core.types import Camera, RenderArgs
from splatpu.render.binning import BinningConfig, PairStream, build_pair_stream, tile_grid
from splatpu.render.types import RenderOutput


def _segmented_exclusive(values, is_start):
    """Per-segment exclusive cumsum along axis 0.

    values: (P, ...); is_start: (P,) bool marking segment starts (index 0 must
    be a start).  Returns cumsum within each segment, excluding the element
    itself.
    """
    cum = jnp.cumsum(values, axis=0)
    excl = cum - values
    # Index of the most recent segment start at or before p.
    idx = jnp.arange(values.shape[0])
    start_idx = jnp.where(is_start, idx, -1)
    seg_start = jax.lax.cummax(start_idx)
    base = excl[seg_start]
    return excl - base


def composite_pairs(
    stream: PairStream,
    camera: Camera,
    config: BinningConfig,
    bg,
    records=None,
):
    from splatpu.render.binning import gather_pair_records

    if records is None:
        records = gather_pair_records(stream)
    r_mean2d, r_conic, r_color, r_opacity, r_depth = records
    TILE = config.tile
    tiles_x, tiles_y = tile_grid(camera, TILE)
    num_tiles = tiles_x * tiles_y
    pc = config.chunk_pairs
    num_chunks = -(-stream.tile.shape[0] // pc)
    c = r_color.shape[1]

    # In-tile pixel coordinates, row-major (r * TILE + c).
    pix = jnp.arange(TILE * TILE, dtype=jnp.float32)
    col = pix % TILE
    row = pix // TILE

    def chunk_step(carry, k):
        log_t, failed, image, depth_acc = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k * pc, pc, axis=0)
        tile = sl(stream.tile)           # (pc,) int32; num_tiles => padding
        mean2d = sl(r_mean2d)
        conic = sl(r_conic)
        color = sl(r_color)
        opacity = sl(r_opacity)
        depth = sl(r_depth)

        tx = (tile % tiles_x).astype(jnp.float32)
        ty = (tile // tiles_x).astype(jnp.float32)
        px = tx[:, None] * TILE + col[None, :]           # (pc, 256)
        py = ty[:, None] * TILE + row[None, :]
        dx = px - mean2d[:, 0:1]
        dy = py - mean2d[:, 1:2]
        power = (
            -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
            - conic[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(0.99, opacity[:, None] * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= 1.0 / 255.0), alpha, 0.0)

        z = jnp.log1p(-alpha)                             # (pc, 256), <= 0
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), tile[1:] != tile[:-1]]
        )
        seg_excl = _segmented_exclusive(z, is_start)      # (pc, 256)
        t_in = jnp.exp(log_t[tile] + seg_excl)            # (pc, 256)
        fail = t_in * (1.0 - alpha) < TRANSMITTANCE_EPS
        # Sticky, serial failure: inclusive any-fail within segment prefix.
        failcum = _segmented_exclusive(fail.astype(jnp.float32), is_start) + fail
        contribute = jnp.logical_not(failed[tile]) & (failcum == 0.0)
        contribute = jax.lax.stop_gradient(contribute)

        w = jnp.where(contribute, alpha * t_in, 0.0)      # (pc, 256)
        image = image.at[tile].add(
            w[:, :, None] * color[:, None, :], mode="drop"
        )
        depth_acc = depth_acc.at[tile].add(w * depth[:, None], mode="drop")
        log_t = log_t.at[tile].add(jnp.where(contribute, z, 0.0), mode="drop")
        failed = failed.at[tile].max(fail, mode="drop")
        return (log_t, failed, image, depth_acc), None

    init = (
        jnp.zeros((num_tiles, TILE * TILE), jnp.float32),        # log T
        jnp.zeros((num_tiles, TILE * TILE), bool),               # failed
        jnp.zeros((num_tiles, TILE * TILE, c), jnp.float32),     # image
        jnp.zeros((num_tiles, TILE * TILE), jnp.float32),        # depth
    )
    (log_t, _failed, image, depth_acc), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init, jnp.arange(num_chunks)
    )

    t_final = jnp.exp(log_t)                                     # (T, 256)
    image = image + t_final[:, :, None] * bg[None, None, :]

    def untile(x_tiles):
        # (T, 256, ...) -> (H_pad, W_pad, ...) -> crop
        shape = (tiles_y, tiles_x, TILE, TILE) + x_tiles.shape[2:]
        x = x_tiles.reshape(shape)
        x = jnp.moveaxis(x, 2, 1).reshape(
            (tiles_y * TILE, tiles_x * TILE) + x_tiles.shape[2:]
        )
        return x[: camera.height, : camera.width]

    image_hw = jnp.moveaxis(untile(image), -1, 0)  # (C, H, W)
    depth_hw = untile(depth_acc)
    t_hw = untile(t_final)
    return image_hw, depth_hw, t_hw


def render_stream(
    args: RenderArgs,
    camera: Camera,
    bg=None,
    config: BinningConfig = BinningConfig(),
) -> RenderOutput:
    """Full tiled render: binning (XLA sort) + pair-stream compositing."""
    if bg is None:
        bg = jnp.zeros((args.colors.shape[1],), jnp.float32)
    stream = build_pair_stream(args, camera, config)
    image, depth, t_final = composite_pairs(stream, camera, config, bg)
    return RenderOutput(
        image=image,
        depth=depth,
        radii=stream.splats.radius,
        final_transmittance=t_final,
        overflowed=stream.overflowed,
        span_overflowed=stream.span_overflowed,
    )
