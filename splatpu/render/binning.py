"""Tile binning: Gaussian -> (tile, depth)-sorted pair stream (pure XLA).

TPU-native replacement for the CUDA rasterizer's binning stage (SURVEY.md §2.1
step 2: cub InclusiveSum + radix sort).  Everything is static-shape:

1. preprocess gives each Gaussian a screen rect of covered 16x16 tiles;
2. every Gaussian emits up to ``max_span`` (static) pair slots; a prefix sum
   over per-Gaussian tile counts assigns each valid pair a unique slot in a
   fixed ``max_pairs`` buffer (overflow pairs are dropped and counted);
3. pairs are sorted once by a fused uint32 key = tile_id << depth_bits |
   quantized-depth (the CUDA kernel sorts [tileID | float-depth-bits] with a
   64-bit radix sort; on TPU a single 32-bit sort with ~2^20 depth levels is
   faster and visually indistinguishable — ties only between Gaussians closer
   than ~1e-6 of the depth range);
4. per-tile [start, end) ranges come from two searchsorteds;
5. the per-pair Gaussian records (mean2d, conic, color, opacity, depth) are
   gathered into sorted order ONCE, so downstream compositors stream
   *contiguous* memory instead of doing random-access gathers.

All indices/keys are stop_gradient'ed; gradients flow through the gathered
record values back to the Gaussian parameters.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from splatpu.core.projection import Splats2D, preprocess
from splatpu.core.types import Camera, RenderArgs

TILE = 16  # legacy pixels per tile side (256-pixel tiles, like the CUDA
           # kernel); the exact path reads BinningConfig.tile instead.
DEFAULT_TILE = 32  # product-default tile side (api.default_config); code
                   # that sizes shards/strips without an explicit
                   # BinningConfig must assume THIS, not TILE.


@dataclasses.dataclass(frozen=True)
class BinningConfig:
    """Static binning budgets (shape-defining, hashable for jit).

    ``chunk_pairs`` is both the compositing chunk size and the per-tile
    segment alignment: each tile's pair segment starts on a chunk boundary, so
    a chunk never straddles two tiles.  That is what lets the Pallas backward
    kernel write pair-gradient chunks with plain DMA (no cross-tile clobber)
    and keeps forward DMA reads aligned.
    """

    tile: int = 16           # pixels per tile side.  16 matches the CUDA kernel's
                             # 16x16 blocks; 32 quarters the tile count and
                             # roughly halves the pair budget a scene needs
                             # (bigger tiles -> fewer (tile, gaussian) pairs)
                             # at 4x the per-pair VPU work.
    max_span: int = 32       # max tiles a single Gaussian may cover (rest dropped;
                             # `overflowed` flags scenes that need more)
    span_small: int = 16     # exact path: lanes emitted for EVERY Gaussian; ones
                             # covering more tiles go through a compacted "big"
                             # domain with max_span lanes.  Emission/sort work is
                             # N*span_small + big_capacity*max_span instead of
                             # N*max_span (~40% less at typical span skew).
    big_capacity: int | None = None  # static big-Gaussian slots; None selects
                             # min(max(1024, n // 16), 65536), further clamped
                             # to [1, n].  Big Gaussians beyond capacity are
                             # dropped entirely (counted in `overflowed`).
    max_pairs: int = 2**20   # total pair budget (pre-alignment)
    chunk_pairs: int = 128   # pair-stream chunk size AND tile segment alignment
                             # (128 measured fastest for the exact grid path on v5e)
    kernel: str = "grid"     # exact-path compositing kernels: "grid" (chunk-table
                             # grid, Mosaic-pipelined DMA) or "manual" (per-tile
                             # grid with explicit in-kernel DMA)
    cull_tiles: bool = True  # exact path: drop (tile, gaussian) pairs whose
                             # alpha upper bound over the tile is < 1/255
                             # (opacity-aware effective radius + rect-distance
                             # test).  Output-exact: the composite kernels
                             # skip those pairs anyway.
    exact_tie_order: bool = True  # break (tile, depth) sort ties by gaussian id
                             # (exact reference radix-sort order); False skips
                             # the secondary key (ties then composite in
                             # emission-class order — visually identical, the
                             # tied pairs differ by < 1 depth quantum)
    scan: str = "mxu2"       # in-kernel lane prefix sums: "mxu2" (128-blocked
                             # triangular matmuls with a 2-pass bf16 split —
                             # fastest, ~2e-6 rel err), "mxu" (one full (G, G)
                             # triangular matmul at Precision.HIGHEST),
                             # "rolls" (log2(G) Hillis-Steele roll+add passes),
                             # or "prod" (grid kernels only: carry
                             # transmittance as a direct product of (1-alpha)
                             # via multiplicative roll scans — drops the
                             # per-element log1p/exp transcendental pair)

    def padded_capacity(self, num_tiles: int) -> int:
        """Worst-case aligned stream length: every non-empty tile wastes at
        most chunk_pairs - 1 slots."""
        return self.max_pairs + self.chunk_pairs * num_tiles

    def resolved_big_capacity(self, n: int) -> int:
        """The exact path's big-class row capacity after defaulting — the
        single source of truth for the `big_capacity=None` heuristic (the
        exact-path binner resolves through this too)."""
        cap = self.big_capacity
        if cap is None:
            cap = min(max(1024, n // 16), 65536)
        return max(1, min(cap, n))


def grow_for_span_overflow(config: BinningConfig, n: int) -> BinningConfig:
    """The growth response to `span_overflowed`: double max_span AND the
    (resolved) big-class capacity.

    `span_overflowed` covers two distinct exhaustions in the exact path — a
    single Gaussian covering more than max_span tiles, and more than
    big_capacity Gaussians each covering more than span_small tiles.  The
    growth handler cannot tell them apart from the flag, and doubling only
    max_span can never clear the second one (big_capacity's default is
    independent of max_span), so it would burn every allowed growth doubling
    the wrong budget.  Doubling both always clears whichever fired; the
    big-domain emission cost (big_capacity * max_span lanes) quadruples per
    growth, which is acceptable for a rare backstop."""
    return dataclasses.replace(
        config,
        max_span=config.max_span * 2,
        big_capacity=min(config.resolved_big_capacity(n) * 2, n),
    )


def adopt_checkpointed_budget(
    config: BinningConfig, ckpt_pairs: int, ckpt_span: int, n: int
) -> tuple[BinningConfig, bool]:
    """Adopt an auto-grown budget recorded in a checkpoint on resume.

    Returns ``(config, changed)``.  A run whose only growth was span-only
    must also adopt (resuming with the original max_span would silently drop
    splats until overflow is re-detected), so EITHER budget exceeding the
    config's triggers adoption.  big_capacity is not checkpointed; span
    growths doubled it in lockstep with max_span (`grow_for_span_overflow`),
    so it is re-derived from the span ratio."""
    if ckpt_pairs <= config.max_pairs and ckpt_span <= config.max_span:
        return config, False
    if ckpt_span > config.max_span:
        ratio = max(1, ckpt_span // config.max_span)
        config = dataclasses.replace(
            config,
            big_capacity=min(config.resolved_big_capacity(n) * ratio, n),
        )
    return (
        dataclasses.replace(
            config,
            max_pairs=max(ckpt_pairs, config.max_pairs),
            max_span=max(ckpt_span, config.max_span),
        ),
        True,
    )


@struct.dataclass
class PairStream:
    """Depth-ordered, tile-segmented stream of splat indices + per-Gaussian
    sources.  Per-pair records are gathered lazily (`gather_pair_records`) by
    consumers that need them; the Pallas path gathers inside its custom_vjp so
    the gather transpose is replaced by an explicit reduction."""

    # Per-pair, sorted by (tile, depth). Length = padded capacity.
    tile: jax.Array       # (P,) int32; == num_tiles for invalid/padding pairs
    gid: jax.Array        # (P,) int32 gaussian index (0 for invalid)
    # Per-Gaussian activated sources (visibility-masked opacity).
    g_colors: jax.Array   # (N, C)
    g_opacity: jax.Array  # (N,)
    # Per-tile ranges into the sorted pair arrays.
    start: jax.Array      # (num_tiles,) int32
    end: jax.Array        # (num_tiles,) int32
    # Gradient-routing aux: emission layout (per-gaussian contiguous slots)
    # and the emission-slot -> padded-position permutation.  Lets backward
    # reduce per-pair gradients to per-gaussian gradients with gathers + a
    # masked sum instead of scatter-adds (see pallas_composite).
    emit_offsets: jax.Array   # (N,) int32 — first emission slot of gaussian g
    emit_counts: jax.Array    # (N,) int32 — number of pairs of gaussian g
    q_of_slot: jax.Array      # (max_pairs,) int32 — padded position per slot
    # Diagnostics.
    total_pairs: jax.Array     # () int32 — pairs before budget clipping
    overflowed: jax.Array      # () bool — pair budget or span budget exceeded
    span_overflowed: jax.Array  # () bool — the SPAN budget specifically
                               # (growth must raise max_span, not max_pairs)
    splats: Splats2D


def tile_grid(camera: Camera, tile: int = TILE) -> tuple[int, int]:
    return -(-camera.width // tile), -(-camera.height // tile)


def _depth_bits_for(num_tiles: int) -> int:
    # Reserve one tile id above the grid as the invalid sentinel; the tile
    # field must hold num_tiles inclusive.  Cap at 24 bits: the quantized
    # value is produced by a float32 multiply, which only carries 24 mantissa
    # bits anyway (and values above 2^24 round, risking overflow into the
    # tile field).
    tile_bits = max(1, (num_tiles + 1).bit_length())
    bits = min(32 - tile_bits, 24)
    if bits < 8:
        raise ValueError(f"image too large: {num_tiles} tiles leaves {bits} depth bits")
    return bits


def build_pair_stream(
    args: RenderArgs,
    camera: Camera,
    config: BinningConfig,
) -> PairStream:
    tiles_x, tiles_y = tile_grid(camera, config.tile)
    num_tiles = tiles_x * tiles_y
    depth_bits = _depth_bits_for(num_tiles)
    max_span = config.max_span
    max_pairs = config.max_pairs

    sp = preprocess(args, camera)
    n = args.n

    # --- Tile rects (CUDA getRect semantics [reconstructed]). ---
    from splatpu.core.projection import tile_rect

    tx0, ty0, tx1, ty1 = tile_rect(
        sp.mean2d, sp.radius, tiles_x, tiles_y, config.tile
    )
    span_w = jnp.where(sp.visible, tx1 - tx0, 0)
    span_h = jnp.where(sp.visible, ty1 - ty0, 0)
    count = span_w * span_h
    span_overflow = jnp.any(count > max_span)
    count = jnp.minimum(count, max_span)

    total_pairs = jnp.sum(count)
    offsets = jnp.cumsum(count) - count  # exclusive prefix sum

    # --- Emit pair slots (N, max_span). ---
    s = jnp.arange(max_span, dtype=jnp.int32)[None, :]       # (1, S)
    valid = s < count[:, None]                               # (N, S)
    safe_w = jnp.maximum(span_w, 1)[:, None]
    sy = s // safe_w
    sx = s - sy * safe_w
    tile_id = (ty0[:, None] + sy) * tiles_x + (tx0[:, None] + sx)  # (N, S)

    # Depth quantization over the visible range.
    d = sp.depth
    big = jnp.float32(1e10)
    dmin = jnp.min(jnp.where(sp.visible, d, big))
    dmax = jnp.max(jnp.where(sp.visible, d, -big))
    limit = (1 << depth_bits) - 1
    dscale = jnp.float32(limit) / jnp.maximum(dmax - dmin, 1e-9)
    # Clamp in the INTEGER domain: the float product can round up to exactly
    # 2^depth_bits, which would overflow into the key's tile field.
    dq = jnp.minimum(
        jnp.clip((d - dmin) * dscale, 0.0, None).astype(jnp.uint32),
        jnp.uint32(limit),
    )

    key = (tile_id.astype(jnp.uint32) << depth_bits) | dq[:, None]  # (N, S)
    slot = offsets[:, None] + s                                     # (N, S)
    slot = jnp.where(valid, slot, max_pairs)  # out-of-bounds => dropped

    keys_buf = jnp.full((max_pairs,), jnp.uint32(0xFFFFFFFF))
    gids_buf = jnp.zeros((max_pairs,), jnp.int32)
    keys_buf = keys_buf.at[slot.reshape(-1)].set(key.reshape(-1), mode="drop")
    gid_src = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_span)
    )
    gids_buf = gids_buf.at[slot.reshape(-1)].set(gid_src.reshape(-1), mode="drop")

    # --- Sort by fused key; carry gaussian ids and the sort permutation.
    # (Pre-sort buffer index IS the emission slot, so the carried iota gives
    # slot-of-sorted-position directly.)
    keys_sorted, gids_sorted, slot_of_p = jax.lax.sort(
        (keys_buf, gids_buf, jnp.arange(max_pairs, dtype=jnp.int32)),
        dimension=0,
        num_keys=1,
    )
    keys_sorted = jax.lax.stop_gradient(keys_sorted)
    gids_sorted = jax.lax.stop_gradient(gids_sorted)
    slot_of_p = jax.lax.stop_gradient(slot_of_p)
    tile_of_pair = (keys_sorted >> depth_bits).astype(jnp.int32)
    # Invalid sentinel keys decode to tile id > num_tiles; clamp to num_tiles so
    # scatter/segment consumers can use a single overflow row.
    tile_of_pair = jnp.minimum(tile_of_pair, num_tiles)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_of_pair, tile_ids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_of_pair, tile_ids, side="right").astype(jnp.int32)

    # --- Re-align: give every tile a chunk-aligned segment. ---
    # Mapping is pure index arithmetic (searchsorted + gather composition);
    # no scatter: padded position q belongs to the tile whose aligned segment
    # contains it, and maps back to sorted position start[t] + offset.
    chunk = config.chunk_pairs
    padded_cap = config.padded_capacity(num_tiles)
    lengths = end - start
    padded_len = ((lengths + chunk - 1) // chunk) * chunk
    padded_start = (jnp.cumsum(padded_len) - padded_len).astype(jnp.int32)
    padded_end = padded_start + lengths

    # Emission-slot -> padded-position permutation (for gradient routing).
    p_pos = jnp.arange(max_pairs, dtype=jnp.int32)
    t_of_p = jnp.minimum(tile_of_pair, num_tiles - 1)
    q_p = padded_start[t_of_p] + (p_pos - start[t_of_p])
    q_p = jnp.clip(q_p, 0, padded_cap - 1)
    q_of_slot = jnp.zeros((max_pairs,), jnp.int32).at[slot_of_p].set(q_p)
    q_of_slot = jax.lax.stop_gradient(q_of_slot)

    q_pos = jnp.arange(padded_cap, dtype=jnp.int32)
    tile_of_q = (
        jnp.searchsorted(padded_start, q_pos, side="right").astype(jnp.int32) - 1
    )
    tile_of_q = jnp.clip(tile_of_q, 0, num_tiles - 1)
    within = q_pos - padded_start[tile_of_q]
    valid_padded = within < lengths[tile_of_q]
    src_p = jnp.clip(start[tile_of_q] + within, 0, max_pairs - 1)
    gid_padded = jnp.where(valid_padded, gids_sorted[src_p], 0)
    tile_padded = jnp.where(valid_padded, tile_of_q, num_tiles)

    return PairStream(
        tile=tile_padded,
        gid=gid_padded,
        g_colors=args.colors,
        g_opacity=jnp.where(sp.visible, args.opacities[:, 0], 0.0),
        start=padded_start,
        end=padded_end,
        emit_offsets=jax.lax.stop_gradient(offsets.astype(jnp.int32)),
        emit_counts=jax.lax.stop_gradient(count.astype(jnp.int32)),
        q_of_slot=q_of_slot,
        total_pairs=total_pairs,
        overflowed=span_overflow | (total_pairs > max_pairs),
        span_overflowed=span_overflow,
        splats=sp,
    )


def gather_pair_records(
    stream: PairStream, g_colors=None, g_mean2d=None
):
    """Per-pair (mean2d, conic, color, opacity, depth) in aligned order.

    Optional overrides swap the color source / mean2d lineage (see
    `render_dual`).  Padding pairs get opacity 0 so they never composite.
    """
    g = stream.gid
    sp = stream.splats
    num_tiles = stream.start.shape[0]
    valid = stream.tile < num_tiles
    mean2d_src = sp.mean2d if g_mean2d is None else g_mean2d
    colors_src = stream.g_colors if g_colors is None else g_colors
    return (
        mean2d_src[g],
        sp.conic[g],
        colors_src[g],
        jnp.where(valid, stream.g_opacity[g], 0.0),
        sp.depth[g],
    )
