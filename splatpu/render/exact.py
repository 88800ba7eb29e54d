"""Exact-budget tile binning + window-masked Pallas compositing.

Second-generation TPU render path (replaces the padded/aligned PairStream of
`binning.py` + `pallas_composite.py` for the hot path).  Same observable
contract as the CUDA rasterizer (SURVEY.md §2.1): per-tile front-to-back
compositing of depth-sorted Gaussian splats with image/depth/transmittance
outputs and analytic gradients to every per-Gaussian input.

Why a second generation: the first path chunk-ALIGNED every tile's pair
segment so kernels could DMA whole chunks, which cost a ~3x padded pair
capacity and hundreds of ms of XLA index arithmetic (searchsorted / gathers
over the padded domain) plus 16 separate record gathers.  This path instead:

1. bins into an EXACT ``max_pairs`` buffer (scatter + one 2-array sort of
   fused u32 keys [tile | quantized depth] carrying u32 [gid | emission lane]);
2. tile segments are plain [start, end) ranges from two searchsorteds — no
   alignment, no padding, no slot permutations;
3. per-pair records come from ONE multi-row column gather
   ``table[:, gid]`` — a (NREC, N) f32 table gathered to (NREC, P) in a
   single fused XLA gather (~14x faster than per-row gathers on TPU);
4. the composite kernels walk the GLOBAL chunk grid: tile t processes aligned
   windows [k*G, (k+1)*G) covering [start_t, end_t) and masks foreign pairs,
   so DMA offsets stay provably G-aligned without any data padding;
5. the backward kernel writes per-pair gradient chunks; a tile's first chunk
   may be shared with its predecessor's tail, so it is read-modify-written
   (grid programs execute sequentially on a TPU core, making RMW race-free);
6. pair gradients are routed back to per-Gaussian gradients by a column
   gather into emission-slot order + a masked per-Gaussian reduction over
   each Gaussian's contiguous emission slots (never a scatter-add).

Reference parity: `GaussianRasterizer.__call__` (reference `densify.py:119-126`,
`train.py:354-361`); binning semantics reconstruct the cub radix-sort pipeline
of diff-gaussian-rasterization-w-depth (SURVEY.md §2.1 step 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatpu.core.projection import TRANSMITTANCE_EPS, Splats2D, preprocess, tile_rect
from splatpu.core.types import Camera, RenderArgs
from splatpu.render.binning import TILE, BinningConfig, _depth_bits_for, tile_grid
from splatpu.render.types import RenderOutput

NPIX = TILE * TILE  # default-tile pixel count; kernels use tile*tile
NREC = 16
R_MX, R_MY, R_CA, R_CB, R_CC, R_OP, R_DEPTH, R_COLOR0 = 0, 1, 2, 3, 4, 5, 6, 7
# Spare record row carrying offsets[g] as f32: the fused record gather
# ``table[:, gid]`` then yields offsets[gid_sorted] for free, replacing a
# separate (P,)-sized gather (~2.6 ms at the bench shape, round-4 trace).
# Exactness: every gaussian with >=1 kept pair has offsets[g] < max_pairs,
# and the row is only trusted when max_pairs <= 2^24 (f32-exact integers).
R_OFF = NREC - 1
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


@struct.dataclass
class ExactStream:
    """Depth-sorted, tile-ranged pair stream over an exact pair budget."""

    gid: jax.Array          # (P,) int32 gaussian id per sorted pair (0 for pad)
    start: jax.Array        # (num_tiles,) int32 segment starts
    end: jax.Array          # (num_tiles,) int32 segment ends
    lane: jax.Array         # (P,) int32 emission lane (rank) per sorted pair;
                            # -1 marks pad/dropped positions.  The slot->
                            # position inverse map is derived lazily in the
                            # BACKWARD pass (`pos_of_slot_of`): forward-only
                            # renders never pay the invert-by-sort, and the
                            # offsets gather it needs rides the fused record
                            # gather (R_OFF row) instead of its own gather.
    offsets: jax.Array      # (N,) int32 first emission slot per gaussian
    counts: jax.Array       # (N,) int32 emitted pairs per gaussian
    g_colors: jax.Array     # (N, C) activated colors
    g_opacity: jax.Array    # (N,) visibility-masked opacity
    total_pairs: jax.Array  # () int32 pairs before budget clipping
    overflowed: jax.Array   # () bool — ANY budget exceeded (union)
    span_overflowed: jax.Array  # () bool — the tile-SPAN budget (max_span /
                            # big-class capacity) specifically; growing the
                            # pair budget cannot fix this, so auto-growth
                            # must raise max_span instead (a span cascade
                            # once needlessly 4x'd the pair budget and
                            # halved stage-1 resume throughput)
    splats: Splats2D


def build_exact_stream(
    args: RenderArgs, camera: Camera, config: BinningConfig
) -> ExactStream:
    tiles_x, tiles_y = tile_grid(camera, config.tile)
    num_tiles = tiles_x * tiles_y
    depth_bits = _depth_bits_for(num_tiles)
    max_span = config.max_span
    mp = config.max_pairs
    lane_bits = max(1, (max_span - 1).bit_length())
    if args.n << lane_bits >= 1 << 31:
        raise ValueError("gaussian count * max_span too large for u32 pair values")

    sp = preprocess(args, camera)
    n = args.n

    tx0, ty0, tx1, ty1 = tile_rect(
        sp.mean2d, sp.radius, tiles_x, tiles_y, config.tile
    )
    span_w = jnp.where(sp.visible, tx1 - tx0, 0)
    span_h = jnp.where(sp.visible, ty1 - ty0, 0)
    # rect_count enumerates the bounding-rect lanes; the per-lane cull below
    # shrinks the *emitted* counts (class split still keys off the rect).
    rect_count = jnp.minimum(span_w * span_h, max_span)
    span_overflow = jnp.any(span_w * span_h > max_span)
    count = rect_count

    # Exactness-preserving tile culling (the CUDA rasterizer's known
    # over-emission; cf. SnugBox/AccuTile in speedy-splat — PAPERS.md): a
    # (tile, gaussian) pair whose alpha is < 1/255 at EVERY pixel of the tile
    # is skipped by the composite kernels anyway, so dropping it at emission
    # changes nothing downstream.  Upper bound over the tile:
    #   alpha <= op * exp(-d_min^2 / (2*lambda_max(cov2d)))
    # with d_min the Euclidean distance from the mean to the tile's
    # pixel-center rect (lambda_min(conic) = 1/lambda_max(cov)).  Cull when
    # the bound is < ALPHA_MIN, i.e. d_min^2 > 2*lambda_max*ln(255*op).
    # (radius/3)^2 >= lambda_max (radius = ceil(3*sqrt(lambda_max)) + the
    # +0.3-dilation slack), so both bounds err on the KEEP side.  Biggest
    # effect on low-opacity Gaussians (post opacity-reset stage-1 clouds:
    # op ~ 0.01 gives r_eff ~ 1.35 sigma vs the 3 sigma rect).
    if config.cull_tiles:
        op_act = jnp.where(sp.visible, args.opacities[:, 0], 0.0)
        lam_max = jnp.square(sp.radius.astype(jnp.float32) / 3.0)
        log_term = jnp.log(jnp.maximum(255.0 * op_act, 1e-12))
        # No cap at radius^2: the emitted rect is an axis-aligned +-radius
        # box, so a contributing pair can sit at up to radius*sqrt(2) from
        # the mean (box corners) — capping at radius^2 wrongly culled corner
        # tiles where alpha still clears 1/255 (op near 1).  log_term is
        # bounded by ln(255) anyway since op <= 1.
        r_eff2 = jnp.maximum(2.0 * lam_max * log_term, 0.0)
        r_eff2 = jax.lax.stop_gradient(r_eff2)
        mean2d_sg = jax.lax.stop_gradient(sp.mean2d)

    # Lane -> in-rect coordinates WITHOUT integer division: sy = s // w
    # computed as floor((s + 0.5) * (1/w)).  Exact: the real value sits at
    # least 0.5/w >= 2^-12 from the next integer while the f32 product's
    # rounding error is < 2^-18 here (s < 2^12, w <= max_span <= 2^12).
    # Variable-divisor integer div/mod lowers to multi-op VPU sequences and
    # was recomputed in BOTH the cull mask and the key emission — on the
    # multi-million-lane emission domain those fusions dominated the
    # binning tail (round-4 trace).
    inv_w = 1.0 / jnp.maximum(span_w, 1).astype(jnp.float32)

    # The per-gaussian inputs below are selected into each class's row
    # domain by a `sel` callable rather than fancy-indexed with a gaussian-id
    # array: the SMALL class's rows are ALL gaussians in order, and XLA does
    # not see through a gather-by-iota — the round-4 trace measured ~0.7-1.0
    # ms PER per-gaussian gather at 100k rows (tx0/ty0/span_w/mean2d/r_eff2/
    # dq/offsets: ~6 ms of pure identity-permutation traffic per frame).
    # sel = identity for the small class; only the compacted big class
    # (cap_b rows) pays real gathers, on a domain ~16x smaller.

    def lane_geom(sel, s_lanes):
        """(sx, sy, tile_id) for the class's rows x lanes `s_lanes`."""
        sy = jnp.floor(
            (s_lanes.astype(jnp.float32) + 0.5) * sel(inv_w)[:, None]
        ).astype(jnp.int32)
        sx = s_lanes - sy * sel(span_w)[:, None]
        tile_id = (
            (sel(ty0)[:, None] + sy) * tiles_x + (sel(tx0)[:, None] + sx)
        )
        return sx, sy, tile_id

    def lane_keep(sel, sx, sy, in_rect):
        """in_rect AND the tile-rect distance test (all (rows, lanes))."""
        if not config.cull_tiles:
            return in_rect
        tl = jnp.float32(config.tile)
        x0 = (sel(tx0)[:, None] + sx).astype(jnp.float32) * tl
        y0 = (sel(ty0)[:, None] + sy).astype(jnp.float32) * tl
        m2 = sel(mean2d_sg)
        mx = m2[:, 0][:, None]
        my = m2[:, 1][:, None]
        # Closest pixel-center of the tile (centers at integer coords
        # [x0, x0 + tile - 1]); the real-valued clamp under-estimates the
        # integer-grid distance, which only keeps more pairs (conservative).
        dx = mx - jnp.clip(mx, x0, x0 + (tl - 1.0))
        dy = my - jnp.clip(my, y0, y0 + (tl - 1.0))
        return in_rect & (dx * dx + dy * dy <= sel(r_eff2)[:, None])

    # Two-class split (resolved BEFORE offsets so emission slots stay dense
    # even when the big class overflows): every Gaussian emits span_small
    # lanes; the few covering more tiles go through a compacted static
    # big-Gaussian domain with the full max_span lanes.  Big Gaussians beyond
    # capacity get count=0 — dropped entirely (flagged), never leaving holes
    # in the slot space the invert-by-sort below depends on.
    gids = jnp.arange(n, dtype=jnp.int32)
    span_small = min(config.span_small, max_span)
    two_class = span_small < max_span
    if two_class:
        cap_b = config.resolved_big_capacity(n)
        is_big = count > span_small
        n_big = jnp.sum(is_big)
        bigrank = jnp.cumsum(is_big) - is_big.astype(jnp.int32)
        span_overflow = span_overflow | (n_big > cap_b)
        count = jnp.where(is_big & (bigrank >= cap_b), 0, count)
        # Dense prefix of kept big gaussian ids (one N-element sort; stable,
        # so original order is preserved).
        _, order = jax.lax.sort(
            ((~is_big).astype(jnp.int32), gids), dimension=0, num_keys=1
        )
        big_ids = jax.lax.stop_gradient(order[:cap_b])

    # Per-lane keep masks (rect membership AND the distance cull), computed
    # BEFORE offsets: emitted counts are the culled counts, so slots stay
    # dense and the pair budget only pays for pairs that can contribute.
    sel_all = lambda x: x  # noqa: E731 — small class: rows ARE all gaussians
    if two_class:
        sel_big = lambda x: x[big_ids]  # noqa: E731
        s_a = jnp.arange(span_small, dtype=jnp.int32)[None, :]
        geom_a = lane_geom(sel_all, s_a)
        v_a = lane_keep(
            sel_all, geom_a[0], geom_a[1],
            (s_a < count[:, None]) & (~is_big)[:, None],
        )
        s_b = jnp.arange(max_span, dtype=jnp.int32)[None, :]
        row_live = (
            jnp.arange(cap_b, dtype=jnp.int32) < jnp.minimum(n_big, cap_b)
        )[:, None]
        geom_b = lane_geom(sel_big, s_b)
        v_b = lane_keep(
            sel_big, geom_b[0], geom_b[1],
            (s_b < sel_big(count)[:, None]) & row_live,
        )
        count_small = jnp.sum(v_a, axis=1)
        count_big = jnp.sum(v_b, axis=1)  # per big row
        safe_rank = jnp.minimum(bigrank, cap_b - 1)
        count = jnp.where(
            is_big & (bigrank < cap_b), count_big[safe_rank], count_small
        ).astype(jnp.int32)
    else:
        s_all = jnp.arange(max_span, dtype=jnp.int32)[None, :]
        geom_all = lane_geom(sel_all, s_all)
        v_all = lane_keep(
            sel_all, geom_all[0], geom_all[1], s_all < count[:, None]
        )
        count = jnp.sum(v_all, axis=1).astype(jnp.int32)

    total_pairs = jnp.sum(count)
    offsets = jnp.cumsum(count) - count

    d = sp.depth
    big_f = jnp.float32(1e10)
    dmin = jnp.min(jnp.where(sp.visible, d, big_f))
    dmax = jnp.max(jnp.where(sp.visible, d, -big_f))
    limit = (1 << depth_bits) - 1
    dscale = jnp.float32(limit) / jnp.maximum(dmax - dmin, 1e-9)
    dq = jnp.minimum(
        jnp.clip((d - dmin) * dscale, 0.0, None).astype(jnp.uint32),
        jnp.uint32(limit),
    )

    sentinel = jnp.uint32(0xFFFFFFFF)

    def emit(sel, g_rows, tile_id, keep):
        """Fused (key, val) emission for one class's rows x precomputed lane
        tile ids (shared with the cull mask's lane geometry — computed once).

        `keep` is the per-lane cull mask; kept lanes are compacted to ranks
        (an exclusive cumsum along the <=max_span lane axis) so emission
        slots stay dense per gaussian.  Budget clipping happens PRE-sort, in
        emission-slot order (the first max_pairs pairs by gaussian index
        survive — same drop policy as a scatter into an mp-sized buffer
        would give, but without the scatter: a direct 2-array sort over the
        emission domain is ~3.5x faster on TPU than scatter-then-sort).
        """
        rank = jnp.cumsum(keep, axis=1) - keep.astype(jnp.int32)
        slot = sel(offsets)[:, None] + rank
        ok = keep & (slot < mp)
        key = (tile_id.astype(jnp.uint32) << depth_bits) | sel(dq)[:, None]
        key = jnp.where(ok, key, sentinel)
        val = ((g_rows[:, None] << lane_bits) | rank).astype(jnp.uint32)
        val = jnp.where(ok, val, jnp.uint32(0))
        return key.reshape(-1), val.reshape(-1)

    if two_class:
        # Sort work drops from N*max_span to N*span_small + cap_b*max_span.
        key_a, val_a = emit(sel_all, gids, geom_a[2], v_a)
        key_b, val_b = emit(sel_big, big_ids, geom_b[2], v_b)
        key_flat = jnp.concatenate([key_a, key_b])
        val_flat = jnp.concatenate([val_a, val_b])
    else:
        key_flat, val_flat = emit(sel_all, gids, geom_all[2], v_all)

    # num_keys=2: the value word (gid << lane_bits | lane) is a secondary sort
    # key, so pairs with equal (tile, quantized-depth) keys composite in global
    # gaussian-index order — matching the reference radix sort's stable tie
    # order even across the two-class emission split (class-B big Gaussians
    # would otherwise all sort after class-A smalls on key ties).
    # is_stable=False when BOTH words are sort keys: (key, val) pairs are
    # globally unique (val embeds gid|lane), so stability adds nothing and
    # XLA's stable lowering would carry an extra iota payload through every
    # radix pass.  With num_keys=1 duplicates exist and the reference's
    # submission-order ties need the stable path.
    keys_all, vals_all = jax.lax.sort(
        (key_flat, val_flat),
        dimension=0,
        num_keys=2 if config.exact_tie_order else 1,
        is_stable=not config.exact_tie_order,
    )
    # All <= mp valid keys sort before the 0xFFFFFFFF sentinels, so the first
    # mp positions contain every kept pair.  Pad for tiny emission domains.
    if keys_all.shape[0] >= mp:
        keys_sorted, vals_sorted = keys_all[:mp], vals_all[:mp]
    else:
        pad = mp - keys_all.shape[0]
        keys_sorted = jnp.concatenate([keys_all, jnp.full((pad,), sentinel)])
        vals_sorted = jnp.concatenate([vals_all, jnp.zeros((pad,), jnp.uint32)])
    keys_sorted = jax.lax.stop_gradient(keys_sorted)
    vals_sorted = jax.lax.stop_gradient(vals_sorted)

    tile_of_pair = jnp.minimum(
        (keys_sorted >> depth_bits).astype(jnp.int32), num_tiles
    )
    # start[t], end[t] from ONE searchsorted over [0, num_tiles]: end == next
    # tile's start (tile_of_pair is sorted and the sentinel decodes past
    # num_tiles - 1).
    bounds = jnp.searchsorted(
        tile_of_pair, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    start, end = bounds[:-1], bounds[1:]

    gid_sorted = (vals_sorted >> lane_bits).astype(jnp.int32)
    lane_sorted = (vals_sorted & ((1 << lane_bits) - 1)).astype(jnp.int32)

    # A position is a real pair iff its key is not the sentinel (real keys can
    # never be 0xFFFFFFFF: real tile ids stay below the tile-field maximum).
    # The emission-slot inverse permutation is NOT built here: the backward
    # pass derives it on demand (`pos_of_slot_of`), so forward-only renders
    # skip the invert-by-sort and the offsets gather entirely.
    valid_p = keys_sorted != sentinel
    lane_tag = jnp.where(valid_p, lane_sorted, jnp.int32(-1))

    return ExactStream(
        gid=gid_sorted,
        start=start,
        end=end,
        lane=jax.lax.stop_gradient(lane_tag),
        offsets=jax.lax.stop_gradient(offsets.astype(jnp.int32)),
        counts=jax.lax.stop_gradient(count.astype(jnp.int32)),
        g_colors=args.colors,
        g_opacity=jnp.where(sp.visible, args.opacities[:, 0], 0.0),
        total_pairs=total_pairs,
        overflowed=span_overflow | (total_pairs > mp),
        span_overflowed=span_overflow,
        splats=sp,
    )


def pos_of_slot_of(offsets, gid, lane, off_of_p=None):
    """Emission slot -> sorted position map (value P for dropped slots).

    Kept slots are exactly the dense range [0, n_kept), so sorting
    (slot, position) puts position p at row slot — an invert-by-sort, which
    beats an mp-sized scatter on TPU.  ``off_of_p`` (P,) = offsets[gid], if
    the caller already has it (the backward pass reads it off the R_OFF
    record row, where it rode the fused record gather for free).
    """
    mp = gid.shape[0]
    if off_of_p is None:
        off_of_p = offsets[gid]
    p_iota = jnp.arange(mp, dtype=jnp.int32)
    slot_tgt = jnp.where(lane >= 0, off_of_p + lane, mp)
    # Valid slots are unique; dropped slots all share the key mp and their
    # relative order is discarded below — stability is irrelevant.
    slot_sorted, pos = jax.lax.sort(
        (slot_tgt, p_iota), dimension=0, num_keys=1, is_stable=False
    )
    return jnp.where(slot_sorted < mp, pos, mp)


# ---------------------------------------------------------------------------
# Kernels (global chunk grid, window-masked)
# ---------------------------------------------------------------------------


def _pixel_coords(t, tiles_x, tile):
    """Tile-LOCAL pixel coordinates plus the tile origin (f32 scalars)."""
    pixi = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = (pixi % tile).astype(jnp.float32)
    py = (pixi // tile).astype(jnp.float32)
    ox = ((t % tiles_x) * tile).astype(jnp.float32)
    oy = ((t // tiles_x) * tile).astype(jnp.float32)
    return px, py, ox, oy


def _lane_cumsum_rolls(x, inclusive=True, reverse=False):
    g = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = x
    d = 1
    while d < g:
        if reverse:
            shifted = pltpu.roll(s, shift=g - d, axis=x.ndim - 1)
            s = s + jnp.where(lane < g - d, shifted, 0.0)
        else:
            shifted = pltpu.roll(s, shift=d, axis=x.ndim - 1)
            s = s + jnp.where(lane >= d, shifted, 0.0)
        d *= 2
    if not inclusive:
        s = s - x
    return s


def _lane_cumsum_mxu(x, inclusive=True, reverse=False):
    """Lane prefix sum as one (G, G) triangular matmul on the MXU.

    out[p, j] = sum_i x[p, i] * tri[i, j].  HIGHEST precision (6-pass bf16
    decomposition) keeps the result f32-accurate; the matmul runs on the MXU
    concurrently with the kernel's VPU elementwise work, whereas the roll
    variant serializes log2(G) cross-lane passes on the VPU.
    """
    g = x.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    cmp = (i >= j) if reverse else (i <= j)
    tri = cmp.astype(jnp.float32)
    s = jax.lax.dot_general(
        x, tri, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if not inclusive:
        s = s - x
    return s


_SCAN_BLOCK = 128  # MXU tile side


def _tri_bf16(b: int, reverse: bool):
    i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    cmp = (i >= j) if reverse else (i <= j)
    return cmp.astype(jnp.bfloat16)


def _split_dot(x, tri):
    """f32-accurate x @ tri in TWO bf16 MXU passes.

    tri is exactly representable in bf16 (entries 0/1), so only x needs the
    hi+lo split; the f32 accumulator then carries ~16 mantissa bits of x —
    3x cheaper than Precision.HIGHEST's 6-pass decomposition at ~2^-16
    relative error (far below render/grad tolerances).
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hi, tri, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(lo, tri, dims, preferred_element_type=jnp.float32)


def _lane_cumsum_mxu2(x, inclusive=True, reverse=False, block=None):
    """Lane prefix sum: blocked triangular matmuls (split-bf16) with an
    inter-block carry.

    Work per element is a constant `block` MACs x 2 passes instead of the
    full (G, G) x 6-pass HIGHEST matmul of `_lane_cumsum_mxu` — ~6x fewer
    MXU MACs at G=256, ~12x at G=512 — while static lane slices keep
    everything layout-aligned (no reshapes).
    """
    g = x.shape[-1]
    b = block or _SCAN_BLOCK
    if g <= b:
        s = _split_dot(x, _tri_bf16(g, reverse))
        return s if inclusive else s - x
    assert g % b == 0
    tri = _tri_bf16(b, reverse)
    nb = g // b
    blocks = [None] * nb
    order = range(nb - 1, -1, -1) if reverse else range(nb)
    carry = None
    for k in order:
        xs = x[..., k * b : (k + 1) * b]
        s = _split_dot(xs, tri)
        if carry is not None:
            s = s + carry
        # Running total through this block == last (first, if reverse)
        # column of the inclusive scan.
        carry = s[..., 0:1] if reverse else s[..., b - 1 : b]
        blocks[k] = s
    s = jnp.concatenate(blocks, axis=-1)
    if not inclusive:
        s = s - x
    return s


def _lane_cumprod_rolls(x, inclusive=True, reverse=False):
    """Lane prefix PRODUCT (multiplicative Hillis-Steele via pltpu.roll).

    Exists so the compositing kernels can carry transmittance directly as a
    product of (1 - alpha) instead of a log-space sum — eliminating the
    log1p + exp transcendental pair per (pixel, lane), which is EUP-bound
    work the MXU sum-scan cannot remove.  Underflow to 0 in lanes past the
    termination point is harmless (those lanes are masked downstream).
    """
    g = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = x
    d = 1
    while d < g:
        if reverse:
            shifted = pltpu.roll(s, shift=g - d, axis=x.ndim - 1)
            s = s * jnp.where(lane < g - d, shifted, 1.0)
        else:
            shifted = pltpu.roll(s, shift=d, axis=x.ndim - 1)
            s = s * jnp.where(lane >= d, shifted, 1.0)
        d *= 2
    if not inclusive:
        # Safe exclusive-from-inclusive: shift by one lane with identity
        # fill (division would produce 0/0 on underflowed tails).
        if reverse:
            s = jnp.where(
                lane < g - 1, pltpu.roll(s, shift=g - 1, axis=x.ndim - 1), 1.0
            )
        else:
            s = jnp.where(lane >= 1, pltpu.roll(s, shift=1, axis=x.ndim - 1), 1.0)
    return s


_SCANS = {
    "mxu": _lane_cumsum_mxu,
    "mxu2": _lane_cumsum_mxu2,
    "rolls": _lane_cumsum_rolls,
}


def _scan_fn(scan: str):
    if scan.startswith("mxu2:"):  # e.g. "mxu2:32" — 32-lane scan blocks
        block = int(scan.split(":", 1)[1])
        return functools.partial(_lane_cumsum_mxu2, block=block)
    return _SCANS[scan]


def _chunk_geometry(rec, px, py, pos, lo, hi, ox, oy):
    """Per-chunk alpha with window mask [lo, hi) on absolute pair positions.

    px/py and the record means must be in the SAME frame; kernels pass
    tile-local coordinates (pixel-in-tile and mean-minus-tile-origin), which
    keeps dx/dy and the quadratic moments well conditioned in f32.
    """
    mx = rec[R_MX : R_MX + 1, :] - ox
    my = rec[R_MY : R_MY + 1, :] - oy
    ca, cb, cc = (
        rec[R_CA : R_CA + 1, :],
        rec[R_CB : R_CB + 1, :],
        rec[R_CC : R_CC + 1, :],
    )
    op = rec[R_OP : R_OP + 1, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw_alpha = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw_alpha)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (pos >= lo) & (pos < hi)
    alpha = jnp.where(keep, alpha, 0.0)
    return dict(
        dx=dx, dy=dy, power=power, raw_alpha=raw_alpha, alpha=alpha,
        mx=mx, my=my, op=op,
        ca=ca, cb=cb, cc=cc, depth=rec[R_DEPTH : R_DEPTH + 1, :],
    )


def _grad_contrib(geo, dpower, w, gdep, gimg, px, py, C):
    """Per-pair gradient rows (NREC, G): direct products + sublane reductions.

    (A central-moment MXU reformulation was measured at parity on v5e while
    costing ~1 digit of precision to cancellation — the VPU products are not
    the bottleneck, so the direct f32 form is kept.)  The opacity row folds
    in for free: where alpha is unclamped and live, dop = exp(power) * dalpha
    = dpower / opacity, and opacity is per-Gaussian constant.
    """
    dx, dy = geo["dx"], geo["dy"]
    ca, cb, cc, op = geo["ca"], geo["cb"], geo["cc"], geo["op"]
    g = w.shape[-1]
    red = lambda x: jnp.sum(x, axis=0, keepdims=True)
    rows = [
        red((ca * dx + cb * dy) * dpower),                       # R_MX
        red((cc * dy + cb * dx) * dpower),                       # R_MY
        red(-0.5 * dx * dx * dpower),                            # R_CA
        red(-dx * dy * dpower),                                  # R_CB
        red(-0.5 * dy * dy * dpower),                            # R_CC
        jnp.where(
            op > 0.0, red(dpower) / jnp.maximum(op, 1e-30), 0.0
        ),                                                       # R_OP
        red(w * gdep),                                           # R_DEPTH
    ]
    for c in range(C):
        rows.append(red(w * gimg[:, c : c + 1]))
    pad = NREC - (R_COLOR0 + C)
    if pad:
        rows.append(jnp.zeros((pad, g), jnp.float32))
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(
    start_ref, end_ref,
    records_ref, bg_ref,
    img_ref, depth_ref, tfin_ref, last_ref,
    rec_buf, sem, tcar, failed,
    *, tiles_x: int, G: int, C: int, scan: str, tile: int = TILE,
):
    NPIX = tile * tile
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    px, py, ox, oy = _pixel_coords(t, tiles_x, tile)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    img_ref[0] = jnp.zeros((C, NPIX), jnp.float32)
    depth_ref[0] = jnp.zeros((NPIX, 1), jnp.float32)
    last_ref[0] = jnp.full((NPIX, 1), -1, jnp.int32)
    tcar[:] = jnp.ones((NPIX, 1), jnp.float32)
    failed[:] = jnp.zeros((NPIX, 1), jnp.float32)

    k0 = s // G
    nchunks = jnp.where(e > s, (e + G - 1) // G - k0, 0)

    def body(k, carry):
        s0 = pl.multiple_of((k0 + k) * G, G)
        cp = pltpu.make_async_copy(records_ref.at[:, pl.ds(s0, G)], rec_buf, sem)
        cp.start()
        cp.wait()
        pos = s0 + lane
        geo = _chunk_geometry(rec_buf[:], px, py, pos, s, e, ox, oy)
        alpha = geo["alpha"]

        z = jnp.log1p(-alpha)
        excl = _scan_fn(scan)(z, inclusive=False)
        t_excl = tcar[:] * jnp.exp(excl)
        fail = (t_excl * (1.0 - alpha) < TRANSMITTANCE_EPS) & (alpha > 0.0)
        first_fail = jnp.min(jnp.where(fail, lane, G), axis=1, keepdims=True)
        contribute = (lane < first_fail) & (failed[:] == 0.0)
        w = jnp.where(contribute, alpha * t_excl, 0.0)

        colors = rec_buf[R_COLOR0 : R_COLOR0 + C, :]
        img_ref[0] += jax.lax.dot_general(
            colors, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        depth_ref[0] += jax.lax.dot_general(
            w, geo["depth"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        zc = jnp.where(contribute, z, 0.0)
        tcar[:] = tcar[:] * jnp.exp(jnp.sum(zc, axis=1, keepdims=True))
        failed[:] = jnp.maximum(
            failed[:], jnp.max(fail.astype(jnp.float32), axis=1, keepdims=True)
        )
        lastp = jnp.max(
            jnp.where(contribute & (alpha > 0.0), pos, -1), axis=1, keepdims=True
        )
        last_ref[0] = jnp.maximum(last_ref[0], lastp)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)

    img_ref[0] += jax.lax.dot_general(
        bg_ref[:], tcar[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    tfin_ref[0] = tcar[:]


def _bwd_kernel(
    start_ref, end_ref,
    records_ref,
    tfin_ref, last_ref, gimg_ref, gdep_ref, gtf_ref, bg_ref,
    grads_ref,
    rec_buf, gbuf, prev_buf, sem_in, sem_out, sem_rmw, tback, gsum,
    *, tiles_x: int, G: int, C: int, scan: str, tile: int = TILE,
):
    NPIX = tile * tile
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    px, py, ox, oy = _pixel_coords(t, tiles_x, tile)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    tfin = tfin_ref[0]
    last = last_ref[0]
    gimg = gimg_ref[0]
    gdep = gdep_ref[0]
    gtf = gtf_ref[0]

    tback[:] = tfin
    gsum[:] = tfin * (
        jax.lax.dot_general(
            gimg, bg_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + gtf
    )

    k0 = s // G
    nchunks = jnp.where(e > s, (e + G - 1) // G - k0, 0)
    # The first chunk may be shared with the previous tile's tail: RMW it.
    # Grid programs run sequentially on the core, so the predecessor's write
    # has completed; everything this tile writes for foreign pairs is zero.
    first_shared = (s % G) != 0

    def body(i, carry):
        k = nchunks - 1 - i
        s0 = pl.multiple_of((k0 + k) * G, G)
        cp = pltpu.make_async_copy(records_ref.at[:, pl.ds(s0, G)], rec_buf, sem_in)
        cp.start()
        cp.wait()
        pos = s0 + lane
        geo = _chunk_geometry(rec_buf[:], px, py, pos, s, e, ox, oy)
        alpha = geo["alpha"]

        in_prefix = pos <= last
        az = jnp.where(in_prefix, jnp.log1p(-alpha), 0.0)
        rev_incl = _scan_fn(scan)(az, inclusive=True, reverse=True)
        t_excl = tback[:] * jnp.exp(-rev_incl)
        w = jnp.where(in_prefix, alpha * t_excl, 0.0)

        chat = gdep * geo["depth"]
        for c in range(C):
            chat += gimg[:, c : c + 1] * rec_buf[R_COLOR0 + c : R_COLOR0 + c + 1, :]
        wchat = w * chat
        suffix = gsum[:] + _scan_fn(scan)(wchat, inclusive=False, reverse=True)

        live = in_prefix & (alpha > 0.0)
        one_minus = jnp.where(live, 1.0 - alpha, 1.0)
        dalpha = jnp.where(live, t_excl * chat - suffix / one_minus, 0.0)
        unclamped = geo["raw_alpha"] < ALPHA_MAX
        dpower = jnp.where(unclamped, alpha * dalpha, 0.0)

        gbuf[:] = _grad_contrib(geo, dpower, w, gdep, gimg, px, py, C)

        @pl.when((k == 0) & first_shared)
        def _():
            rmw = pltpu.make_async_copy(
                grads_ref.at[:, pl.ds(s0, G)], prev_buf, sem_rmw
            )
            rmw.start()
            rmw.wait()
            gbuf[:] += prev_buf[:]

        out_cp = pltpu.make_async_copy(gbuf, grads_ref.at[:, pl.ds(s0, G)], sem_out)
        out_cp.start()
        out_cp.wait()

        tback[:] = tback[:] * jnp.exp(-jnp.sum(az, axis=1, keepdims=True))
        gsum[:] = gsum[:] + jnp.sum(wchat, axis=1, keepdims=True)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)


# ---------------------------------------------------------------------------
# Chunk-table grid kernels (one grid step per chunk; Mosaic pipelines DMA)
# ---------------------------------------------------------------------------
#
# Instead of a per-tile grid with a manual-DMA fori_loop over the tile's
# chunks, the grid walks a precomputed chunk table: step k serves chunk
# blk[k] of tile t[k].  Records arrive through a blocked in_spec whose
# index_map reads the scalar-prefetched table, so the Mosaic pipeline
# prefetches chunk k+1 while chunk k computes (automatic double buffering —
# the manual 2-slot pipeline this replaces deadlocked the chip, see
# pallas_composite.py).  Per-tile accumulators (image, transmittance, ...)
# live in output blocks / scratch that persist across consecutive steps of
# the same tile (revisited block indices are not flushed between steps).


def _chunk_tables(start, end, num_tiles: int, mp: int, G: int, reverse: bool):
    """Per-chunk scalar tables for the grid kernels.

    Returns (tile, blk, lo, hi, first, marker), each (max_chunks,) int32,
    where max_chunks = mp//G + num_tiles statically bounds the chunk count
    (each tile costs at most len/G + 1 chunks, at least 1).

    Forward tables (reverse=False) list every tile's chunks low→high, tiles
    ascending; empty tiles get one no-op chunk (lo == hi) so their outputs
    still get initialized + background-composited; `marker` is the is-last-
    chunk-of-tile flag (finalize).  Backward tables (reverse=True) list tiles
    DESCENDING with chunks high→low so back-to-front compositing works AND
    the boundary chunk shared by adjacent tiles is visited in consecutive
    steps (tile t's final step and tile t-1's first step), which is what lets
    the output block accumulate in VMEM; `marker` is the new-output-block
    flag (init vs accumulate), and no-op chunks inherit the previous step's
    block so they never flush a foreign block with stale contents.
    """
    max_chunks = mp // G + num_tiles
    n_blocks = mp // G
    lens = end - start
    k0 = start // G
    k1 = jax.lax.div(end + (G - 1), G)
    nch = jnp.where(lens > 0, k1 - k0, 1).astype(jnp.int32)

    order = jnp.arange(num_tiles, dtype=jnp.int32)
    if reverse:
        order = order[::-1]
    nch_o = nch[order]
    cstart = (jnp.cumsum(nch_o) - nch_o).astype(jnp.int32)
    total = cstart[-1] + nch_o[-1]

    k = jnp.arange(max_chunks, dtype=jnp.int32)
    idx = jnp.clip(
        jnp.searchsorted(cstart, k, side="right").astype(jnp.int32) - 1,
        0,
        num_tiles - 1,
    )
    t = order[idx]
    within = k - cstart[idx]
    ch = jnp.where(reverse, k0[t] + nch[t] - 1 - within, k0[t] + within)
    blk = jnp.clip(ch, 0, n_blocks - 1)
    real = k < total
    nonempty = (lens[t] > 0) & real
    lo = jnp.where(nonempty, start[t], 0)
    hi = jnp.where(nonempty, end[t], 0)
    first = ((within == 0) & real).astype(jnp.int32)

    if reverse:
        # No-op steps (empty tiles, padding) must rewrite the previous real
        # step's block, not claim a new one.
        src = jax.lax.cummax(jnp.where(nonempty, k, -1))
        blk = jnp.where(nonempty, blk, blk[jnp.maximum(src, 0)])
        prev_blk = jnp.concatenate([blk[:1] - 1, blk[:-1]])
        marker = ((blk != prev_blk) | (k == 0)).astype(jnp.int32)
        # Padding steps keep tile = the last real tile (tile 0 in reverse
        # order) so per-tile input blocks are not flushed/reloaded wrongly.
        t = jnp.where(real, t, order[num_tiles - 1])
    else:
        marker = ((within == nch[t] - 1) & real).astype(jnp.int32)
        t = jnp.where(real, t, order[num_tiles - 1])

    sg = jax.lax.stop_gradient
    return sg(t), sg(blk), sg(lo), sg(hi), sg(first), sg(marker)


# Packed forward-output lane layout (one (NPIX, PACK) block per tile):
# lanes [0, C) image, C depth, C+1 final transmittance, C+2 last-contributor
# position (as f32; positions < 2^24 are exact).  One output block instead of
# four: each extra output block pipeline costs ~0.17 us/grid-step on v5e
# (measured, scripts/probe_kernel_cost.py), which dominated the kernels.
PACK = 8


def _fwd_kernel_grid(
    tile_s, blk_s, lo_s, hi_s, first_s, last_s,
    records_ref, bg_ref,
    out_ref,
    tcar, failed,
    *, tiles_x: int, G: int, C: int, scan: str, tile: int = TILE,
):
    NPIX = tile * tile
    k = pl.program_id(0)
    t = tile_s[k]
    lo = lo_s[k]
    hi = hi_s[k]
    first = first_s[k] == 1
    last = last_s[k] == 1

    # Padding steps (lo == hi, not first/last of any tile) skip all compute;
    # they only exist to keep the grid size static.
    @pl.when((lo < hi) | first | last)
    def _run():
        @pl.when(first)
        def _():
            out_ref[0] = jnp.zeros((NPIX, PACK), jnp.float32)
            out_ref[0, :, C + 2 : C + 3] = jnp.full((NPIX, 1), -1.0, jnp.float32)
            tcar[:] = jnp.ones((NPIX, 1), jnp.float32)
            failed[:] = jnp.zeros((NPIX, 1), jnp.float32)

        # Early termination (the CUDA render kernel's per-tile "done" break,
        # SURVEY.md §2.1 step 3): once every pixel has saturated, remaining
        # chunks cannot contribute — skip their compute entirely.
        all_done = jnp.min(failed[:]) == 1.0

        @pl.when((lo < hi) & jnp.logical_not(all_done))
        def _compute():
            px, py, ox, oy = _pixel_coords(t, tiles_x, tile)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
            pos = blk_s[k] * G + lane
            geo = _chunk_geometry(records_ref[:], px, py, pos, lo, hi, ox, oy)
            alpha = geo["alpha"]

            if scan == "prod":
                # Transmittance as a direct product of (1 - alpha): no
                # log1p/exp transcendentals (EUP-bound), at the cost of a
                # log2(G)-pass multiplicative roll scan on the VPU.
                one_minus = 1.0 - alpha
                t_excl = tcar[:] * _lane_cumprod_rolls(one_minus, inclusive=False)
            else:
                z = jnp.log1p(-alpha)
                excl = _scan_fn(scan)(z, inclusive=False)
                t_excl = tcar[:] * jnp.exp(excl)
            fail = (t_excl * (1.0 - alpha) < TRANSMITTANCE_EPS) & (alpha > 0.0)
            # contribute <=> no fail at any lane <= this one: a first-fail
            # lane MIN-reduction replaces a second full prefix scan (the
            # scans are the kernel's dominant MXU cost).
            first_fail = jnp.min(
                jnp.where(fail, lane, G), axis=1, keepdims=True
            )
            contribute = (lane < first_fail) & (failed[:] == 0.0)
            w = jnp.where(contribute, alpha * t_excl, 0.0)

            colors = records_ref[R_COLOR0 : R_COLOR0 + C, :]
            out_ref[0, :, 0:C] += jax.lax.dot_general(
                w, colors, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[0, :, C : C + 1] += jax.lax.dot_general(
                w, geo["depth"], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if scan == "prod":
                # Product over contributing lanes without reduce_prod
                # (unsupported by Mosaic): partial products t_excl*one_minus
                # are monotone non-increasing along lanes, so the MIN over
                # the contribute prefix equals the last partial product —
                # i.e. tcar * prod of one_minus over contributing lanes.
                tcar[:] = jnp.min(
                    jnp.where(contribute, t_excl * one_minus, tcar[:]),
                    axis=1,
                    keepdims=True,
                )
            else:
                zc = jnp.where(contribute, z, 0.0)
                tcar[:] = tcar[:] * jnp.exp(jnp.sum(zc, axis=1, keepdims=True))
            failed[:] = jnp.maximum(
                failed[:],
                jnp.max(fail.astype(jnp.float32), axis=1, keepdims=True),
            )
            lastp = jnp.max(
                jnp.where(contribute & (alpha > 0.0), pos.astype(jnp.float32), -1.0),
                axis=1,
                keepdims=True,
            )
            out_ref[0, :, C + 2 : C + 3] = jnp.maximum(
                out_ref[0, :, C + 2 : C + 3], lastp
            )

        @pl.when(last)
        def _():
            out_ref[0, :, 0:C] += tcar[:] * bg_ref[0:1, :]
            out_ref[0, :, C + 1 : C + 2] = tcar[:]


# Packed backward-cotangent lane layout (one (NPIX, PACK) input block):
# lanes [0, C) d(image), C d(depth), C+1 d(final transmittance).  The other
# packed input is the forward kernel's PACK block (tfin/last lanes).


def _bwd_kernel_grid(
    tile_s, blk_s, lo_s, hi_s, first_s, newblk_s,
    records_ref, fwdout_ref, cot_ref, bg_ref,
    grads_ref,
    tback, gsum,
    *, tiles_x: int, G: int, C: int, scan: str, tile: int = TILE,
):
    # The cotangents arrive as ONE packed (NPIX, PACK) input block.  A
    # round-4 attempt to pass them as three separate blocks (saving the
    # XLA-side concat, ~2 ms/frame) ran out of SCOPED VMEM under
    # jax.vmap(5 views): each extra double-buffered per-tile block
    # multiplies by the vmap batch (21.3 MB needed vs the 16 MB scoped
    # limit) and crashed the TPU worker at stage-2 training shapes — the
    # packed form is required for the vmapped multi-view training path.
    NPIX = tile * tile
    k = pl.program_id(0)
    t = tile_s[k]
    lo = lo_s[k]
    hi = hi_s[k]
    first = first_s[k] == 1
    newblk = newblk_s[k] == 1

    @pl.when(first & (lo < hi))
    def _():
        tfin = fwdout_ref[0, :, C + 1 : C + 2]
        tback[:] = tfin
        # Unrolled (NPIX, C) x (C,) contraction: Mosaic rejects the tiny
        # dot_general here ("only constant accumulators supported").
        gbg = cot_ref[0, :, C + 1 : C + 2]  # d(tfin) cotangent
        for c in range(C):
            gbg = gbg + cot_ref[0, :, c : c + 1] * bg_ref[0:1, c : c + 1]
        gsum[:] = tfin * gbg

    # Beyond-last-contributor skip (mirror of the forward kernel's early
    # termination): a chunk whose positions all exceed the tile's furthest
    # per-pixel last contributor has zero gradient everywhere; in the
    # reverse walk these are each tile's FIRST chunks.  Skipped chunks that
    # own a fresh output block still zero-fill it (routing reads it).
    last_f = fwdout_ref[0, :, C + 2 : C + 3]
    relevant = (lo < hi) & (
        (blk_s[k] * G).astype(jnp.float32) <= jnp.max(last_f)
    )

    @pl.when(relevant)
    def _run():
        px, py, ox, oy = _pixel_coords(t, tiles_x, tile)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

        gimg = cot_ref[0, :, 0:C]
        gdep = cot_ref[0, :, C : C + 1]

        pos = blk_s[k] * G + lane
        geo = _chunk_geometry(records_ref[:], px, py, pos, lo, hi, ox, oy)
        alpha = geo["alpha"]

        in_prefix = pos.astype(jnp.float32) <= last_f
        if scan == "prod":
            # Reverse walk in product space: t_excl = tback / srev, with
            # srev the suffix product of (1 - alpha) over in-prefix lanes.
            # Safe division: within the prefix the forward termination rule
            # bounds every per-chunk transmittance ratio below by ~1e-4.
            one_minus_p = jnp.where(in_prefix, 1.0 - alpha, 1.0)
            srev = _lane_cumprod_rolls(one_minus_p, inclusive=True, reverse=True)
            t_excl = tback[:] / srev
            sum_scan = _scan_fn("mxu2")
        else:
            az = jnp.where(in_prefix, jnp.log1p(-alpha), 0.0)
            rev_incl = _scan_fn(scan)(az, inclusive=True, reverse=True)
            t_excl = tback[:] * jnp.exp(-rev_incl)
            sum_scan = _scan_fn(scan)
        w = jnp.where(in_prefix, alpha * t_excl, 0.0)

        chat = gdep * geo["depth"]
        for c in range(C):
            chat += (
                gimg[:, c : c + 1] * records_ref[R_COLOR0 + c : R_COLOR0 + c + 1, :]
            )
        wchat = w * chat
        suffix = gsum[:] + sum_scan(wchat, inclusive=False, reverse=True)

        live = in_prefix & (alpha > 0.0)
        one_minus = jnp.where(live, 1.0 - alpha, 1.0)
        dalpha = jnp.where(live, t_excl * chat - suffix / one_minus, 0.0)
        unclamped = geo["raw_alpha"] < ALPHA_MAX
        dpower = jnp.where(unclamped, alpha * dalpha, 0.0)

        contrib = _grad_contrib(geo, dpower, w, gdep, gimg, px, py, C)

        @pl.when(newblk)
        def _():
            grads_ref[:] = contrib

        @pl.when(jnp.logical_not(newblk))
        def _():
            grads_ref[:] += contrib

        if scan == "prod":
            # Lane 0 of the reverse-inclusive scan IS the full-chunk product.
            tback[:] = tback[:] / srev[:, 0:1]
        else:
            tback[:] = tback[:] * jnp.exp(-jnp.sum(az, axis=1, keepdims=True))
        gsum[:] = gsum[:] + jnp.sum(wchat, axis=1, keepdims=True)

    @pl.when(jnp.logical_not(relevant) & newblk)
    def _zero_fill():
        grads_ref[:] = jnp.zeros((NREC, G), jnp.float32)


def _fwd_call_grid(
    records, start, end, bg_row, *, num_tiles, tiles_x, G, C, scan, tile=TILE
):
    """Packed forward: returns (num_tiles, NPIX, PACK) — see PACK layout."""
    NPIX = tile * tile
    mp = records.shape[1]
    max_chunks = mp // G + num_tiles
    tables = _chunk_tables(start, end, num_tiles, mp, G, reverse=False)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(max_chunks,),
        in_specs=[
            pl.BlockSpec(
                (NREC, G),
                lambda k, tile_s, blk_s, *_: (0, blk_s[k]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, NPIX, PACK), lambda k, tile_s, *_: (tile_s[k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((NPIX, 1), jnp.float32),
            pltpu.VMEM((NPIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel_grid, tiles_x=tiles_x, G=G, C=C, scan=scan, tile=tile
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, NPIX, PACK), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*tables, records, bg_row)
    return out


def _bwd_call_grid(
    records, start, end, bg_row, fwdout, cot,
    *, num_tiles, tiles_x, G, C, scan, tile=TILE,
):
    NPIX = tile * tile
    mp = records.shape[1]
    max_chunks = mp // G + num_tiles
    tables = _chunk_tables(start, end, num_tiles, mp, G, reverse=True)
    tile_block = lambda k, tile_s, *_: (tile_s[k], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(max_chunks,),
        in_specs=[
            pl.BlockSpec(
                (NREC, G),
                lambda k, tile_s, blk_s, *_: (0, blk_s[k]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, NPIX, PACK), tile_block, memory_space=pltpu.VMEM),
            # Cotangents carry only C+2 real lanes (d image, d depth,
            # d tfin) — passing exactly that many instead of a PACK block
            # drops the XLA-side zero-lane padding concat (~0.7 ms) and 3/8
            # of the cot HBM traffic.  Still ONE block: the round-4 VMEM
            # blowout came from extra double-buffered blocks, not width.
            pl.BlockSpec((1, NPIX, C + 2), tile_block, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (NREC, G),
                lambda k, tile_s, blk_s, *_: (0, blk_s[k]),
                memory_space=pltpu.VMEM,
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((NPIX, 1), jnp.float32),
            pltpu.VMEM((NPIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel_grid, tiles_x=tiles_x, G=G, C=C, scan=scan, tile=tile
    )
    (grads,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(records.shape, jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*tables, records, fwdout, cot, bg_row)
    return grads


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(
    records, start, end, bg, *, num_tiles, tiles_x, G, C, scan, tile=TILE
):
    NPIX = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, NPIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((NPIX, 1), jnp.float32),
            pltpu.VMEM((NPIX, 1), jnp.float32),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((num_tiles, C, NPIX), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.int32),
    ]
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, G=G, C=C, scan=scan, tile=tile
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(start, end, records, bg)


def _bwd_call(
    records, start, end, bg, tfin, last, g_img_pix, g_dep, g_tf,
    *, num_tiles, tiles_x, G, C, scan, tile=TILE,
):
    NPIX = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, C), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((NPIX, 1), jnp.float32),
            pltpu.VMEM((NPIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, G=G, C=C, scan=scan, tile=tile
    )
    (grads,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(records.shape, jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(start, end, records, tfin, last, g_img_pix, g_dep, g_tf, bg)
    return grads


# ---------------------------------------------------------------------------
# custom VJP over the per-Gaussian record table
# ---------------------------------------------------------------------------


_ROUTE_CUMSUM_BLOCK = 2048     # columns per sequential-grid step
_ROUTE_PALLAS_MIN = 1 << 19    # below this XLA's cumsum is fine


def _cumsum_pairs_pallas(x, block_cols=_ROUTE_CUMSUM_BLOCK):
    """(R, P) inclusive cumsum along the pair axis in ONE Pallas pass.

    TPU grids execute sequentially, so a single kernel carries the running
    total across column blocks in a VMEM scratch — one HBM read + one write
    of x total, where XLA's cumsum decomposition costs multiple full passes
    at multi-million P (the budget-linear routing bottleneck at 500k-Gaussian
    scale, BASELINE config 4).  In-block scans reuse the split-bf16 MXU
    triangular matmuls (`_lane_cumsum_mxu2`, ~2^-16 relative error)."""
    r, p_len = x.shape
    if p_len % block_cols != 0:
        return jnp.cumsum(x, axis=1)
    grid = p_len // block_cols

    def kernel(x_ref, o_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        cs = _lane_cumsum_mxu2(x_ref[:]) + carry_ref[:]
        o_ref[:] = cs
        carry_ref[:] = cs[:, block_cols - 1 : block_cols]

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((r, block_cols), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, block_cols), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, p_len), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 1), jnp.float32)],
        interpret=_interpret(),
    )(x)


def _route_to_table(grads, offsets, counts, pos_of_slot, n_rows):
    """Per-pair grads (NREC, P) -> per-Gaussian grads (NREC, N).

    One column gather into emission-slot order, then per-Gaussian segment
    sums via cumsum + boundary differences: each Gaussian's slots are the
    contiguous range [offsets[g], offsets[g] + counts[g]), so its segment sum
    is csum[hi] - csum[lo].  This does O(P) work instead of the O(N *
    max_span) windowed gather (~3.5x faster at 100k Gaussians / span 32), and
    never scatter-adds.  Rounding from the long cumsum is ~eps * |running
    sum|, orders of magnitude below gradient-test tolerances.

    Only the first ``n_rows`` record rows carry real gradients (7 geometry
    rows + C color rows); the NREC padding rows are sliced off before the
    big gather/cumsum (~40% less permutation traffic at C=3) and re-padded
    with zeros at the end.
    """
    mp = pos_of_slot.shape[0]
    nrec = grads.shape[0]
    grads = grads[:n_rows]
    valid = pos_of_slot < mp
    slotg = jnp.where(
        valid[None, :], grads[:, jnp.minimum(pos_of_slot, mp - 1)], 0.0
    )  # (n_rows, P) in emission-slot order; dropped slots contribute 0
    if mp >= _ROUTE_PALLAS_MIN and not _interpret():
        csum = _cumsum_pairs_pallas(slotg)
    else:
        csum = jnp.cumsum(slotg, axis=1)
    # ONE boundary gather instead of two: segment ends are the next
    # segment's starts (offsets[g] + counts[g] == offsets[g+1], both built
    # from the same cumsum), so b[g] = csum at gaussian g's last slot is
    # ALSO gaussian g+1's lower boundary — shift instead of re-gather.
    ends = offsets + counts
    b = jnp.where(
        (ends > 0)[None, :], csum[:, jnp.clip(ends - 1, 0, mp - 1)], 0.0
    )  # (n_rows, N) cumulative sum through each gaussian's segment
    out = b - jnp.concatenate(
        [jnp.zeros((b.shape[0], 1), b.dtype), b[:, :-1]], axis=1
    )
    return jnp.concatenate(
        [out, jnp.zeros((nrec - n_rows, out.shape[1]), out.dtype)], axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _composite_table(
    table, bg, gid, start, end, offsets, counts, lane, static
):
    out, _ = _composite_table_fwd(
        table, bg, gid, start, end, offsets, counts, lane, static
    )
    return out


def _composite_table_fwd(
    table, bg, gid, start, end, offsets, counts, lane, static
):
    """Outputs are pixel-major per tile: (img (T, NPIX, C), dep (T, NPIX),
    tfin (T, NPIX)) — cotangents then arrive already in the packed kernels'
    layout, with zero transposes on either side."""
    num_tiles, tiles_x, G, C, _max_span, kernel, scan, tile = static
    records = table[:, gid]  # (NREC, P) single fused column gather
    if kernel == "grid":
        packed = _fwd_call_grid(
            records, start, end, bg[None, :],
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=scan,
            tile=tile,
        )
        out = (packed[..., :C], packed[..., C], packed[..., C + 1])
        aux = packed
    else:
        img, dep, tfin, last = _fwd_call(
            records, start, end, bg[:, None],
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=scan,
            tile=tile,
        )
        out = (jnp.swapaxes(img, 1, 2), dep[..., 0], tfin[..., 0])
        aux = (tfin, last)
    residuals = (records, start, end, bg, aux, offsets, counts, lane, gid)
    return out, residuals


def _composite_table_bwd(static, residuals, cotangents):
    num_tiles, tiles_x, G, C, _max_span, kernel, scan, tile = static
    records, start, end, bg, aux, offsets, counts, lane, gid = residuals
    g_img, g_dep, g_tf = cotangents  # g_img is (T, NPIX, C)
    if kernel == "grid":
        packed = aux
        cot = jnp.concatenate(
            [g_img, g_dep[..., None], g_tf[..., None]], axis=-1
        )  # (T, NPIX, C+2) — exactly the lanes the kernel reads
        grads = _bwd_call_grid(
            records, start, end, bg[None, :], packed, cot,
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=scan,
            tile=tile,
        )
        tfin = packed[..., C + 1]
    else:
        tfin4, last4 = aux
        grads = _bwd_call(
            records, start, end, bg[:, None], tfin4, last4,
            g_img, g_dep[..., None], g_tf[..., None],
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=scan,
            tile=tile,
        )
        tfin = tfin4[..., 0]
    mp = lane.shape[0]
    if mp <= 1 << 24 and R_COLOR0 + C <= R_OFF:
        # offsets[gid] rode the fused record gather (R_OFF row); every kept
        # pair's offset is < max_pairs <= 2^24, exact in f32.
        off_of_p = records[R_OFF].astype(jnp.int32)
    else:
        off_of_p = offsets[gid]
    pos_of_slot = pos_of_slot_of(offsets, gid, lane, off_of_p=off_of_p)
    d_table = _route_to_table(grads, offsets, counts, pos_of_slot, R_COLOR0 + C)
    d_bg = jnp.einsum("tpc,tp->c", g_img, tfin)
    return (d_table, d_bg, None, None, None, None, None, None)


_composite_table.defvjp(_composite_table_fwd, _composite_table_bwd)


# ---------------------------------------------------------------------------
# Public renderer
# ---------------------------------------------------------------------------


def _pack_table(mean2d, conic, color, opacity, depth, offsets=None):
    """(NREC, N) record table.  When ``offsets`` is given (and a spare row
    exists), it is carried in row R_OFF so the backward routing's
    offsets[gid] comes out of the fused record gather for free."""
    c = color.shape[1]
    if c > NREC - R_COLOR0:
        raise ValueError(f"at most {NREC - R_COLOR0} color channels supported")
    rows = [
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opacity, depth,
    ] + [color[:, i] for i in range(c)]
    rows += [jnp.zeros_like(opacity)] * (NREC - len(rows))
    if offsets is not None and len(rows) == NREC and R_COLOR0 + c <= R_OFF:
        rows[R_OFF] = jax.lax.stop_gradient(offsets.astype(jnp.float32))
    return jnp.stack(rows, axis=0)  # (NREC, N)


def composite_exact(
    stream: ExactStream,
    camera: Camera,
    config: BinningConfig,
    bg,
    g_colors=None,
    g_mean2d=None,
) -> RenderOutput:
    colors = stream.g_colors if g_colors is None else g_colors
    mean2d = stream.splats.mean2d if g_mean2d is None else g_mean2d
    c = colors.shape[1]
    if config.chunk_pairs % 128 != 0:
        raise ValueError("chunk_pairs must be a multiple of 128 for the TPU kernel")
    if config.kernel == "grid" and config.max_pairs % config.chunk_pairs != 0:
        raise ValueError("max_pairs must be a multiple of chunk_pairs (grid kernel)")
    if config.kernel == "grid" and c > PACK - 3:
        raise ValueError(
            f"the grid kernel's packed output supports at most {PACK - 3} color"
            f" channels (got {c}); use kernel='manual' for more"
        )
    if config.kernel == "grid" and config.max_pairs > 1 << 24:
        # The grid kernel stores last-contributor pair positions as f32 (lane
        # C+2) and compares them in the backward walk; positions >= 2^24 are
        # not exactly representable and would silently corrupt in_prefix
        # masking and gradients.
        raise ValueError(
            "kernel='grid' supports max_pairs <= 2^24 (f32-exact pair"
            f" positions); got {config.max_pairs}. Use kernel='manual'."
        )
    if config.scan == "prod" and config.kernel != "grid":
        # The multiplicative transmittance carry exists only as branches in
        # the grid kernels; _SCANS has no 'prod' entry, so the manual path
        # would die with a bare KeyError mid-trace.
        raise ValueError("scan='prod' requires kernel='grid'")

    tiles_x, tiles_y = tile_grid(camera, config.tile)
    num_tiles = tiles_x * tiles_y
    static = (
        num_tiles, tiles_x, config.chunk_pairs, c, config.max_span,
        config.kernel, config.scan, config.tile,
    )
    table = _pack_table(
        mean2d, stream.splats.conic, colors, stream.g_opacity,
        stream.splats.depth,
        offsets=stream.offsets if config.max_pairs <= 1 << 24 else None,
    )
    img_tiles, depth_tiles, tfin_tiles = _composite_table(
        table, bg, stream.gid, stream.start, stream.end,
        stream.offsets, stream.counts, stream.lane, static,
    )

    tl = config.tile

    def untile(x_tiles):
        if x_tiles.ndim == 3:  # (T, NPIX, C) pixel-major -> (C, H, W)
            x = x_tiles.reshape(tiles_y, tiles_x, tl, tl, -1)
            x = jnp.transpose(x, (4, 0, 2, 1, 3)).reshape(
                -1, tiles_y * tl, tiles_x * tl
            )
            return x[:, : camera.height, : camera.width]
        x = x_tiles.reshape(tiles_y, tiles_x, tl, tl)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(tiles_y * tl, tiles_x * tl)
        return x[: camera.height, : camera.width]

    return RenderOutput(
        image=untile(img_tiles),
        depth=untile(depth_tiles),
        radii=stream.splats.radius,
        final_transmittance=untile(tfin_tiles),
        overflowed=stream.overflowed,
        span_overflowed=stream.span_overflowed,
    )


def render_pallas_exact(
    args: RenderArgs, camera: Camera, bg=None, config: BinningConfig = BinningConfig()
) -> RenderOutput:
    """Full tiled render: exact binning + window-masked Pallas compositing."""
    c = args.colors.shape[1]
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)
    stream = build_exact_stream(args, camera, config)
    return composite_exact(stream, camera, config, bg)
