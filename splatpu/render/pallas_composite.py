"""Pallas TPU tile-compositing kernels (forward + analytic backward).

The TPU-native replacement for the CUDA render/render-backward kernels
(SURVEY.md §2.1 steps 3-4).  Consumes the chunk-aligned `PairStream` from
`binning.py`:

- grid = one program per 16x16 tile; each program streams its tile's pair
  segment from HBM in chunks of ``G = chunk_pairs`` records via async DMA
  (segments are chunk-aligned, so a chunk never straddles tiles);
- per chunk, alpha for all (256 pixels x G pairs) is evaluated as dense VPU
  math; the *serial* front-to-back compositing order is recovered
  algebraically with an in-register Hillis-Steele prefix scan over the pair
  lanes (log2(G) shifted adds) of log(1 - alpha) — no atomics, no sorting in
  the kernel;
- termination matches the CUDA rule exactly (a pair that would drop T below
  1e-4 is dropped together with everything behind it); per-pixel transmittance
  and a last-contributor index carry across chunks in VMEM scratch;
- color/depth accumulation hits the MXU ((C, G) x (256, G) contractions);
- backward re-walks each tile's chunks back-to-front (like the CUDA backward)
  reconstructing transmittance by division and suffix scans, and writes
  per-PAIR gradients to a pairs-aligned buffer with plain DMA — the routing of
  pair gradients back to per-Gaussian parameters is the (XLA-generated)
  transpose of the binning gathers, so no scatter appears here.

The custom_vjp boundary wraps exactly (pair records -> tile images); binning
and preprocessing stay ordinary differentiable XLA.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatpu.core.projection import TRANSMITTANCE_EPS
from splatpu.render.binning import TILE, BinningConfig, PairStream, build_pair_stream, tile_grid
from splatpu.render.types import RenderOutput

NPIX = TILE * TILE  # 256 pixels per tile
NREC = 16           # packed record rows (pad to a power of two)
# Record row indices.
R_MX, R_MY, R_CA, R_CB, R_CC, R_OP, R_DEPTH, R_COLOR0 = 0, 1, 2, 3, 4, 5, 6, 7
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _lane_cumsum(x, inclusive=True, reverse=False):
    """Hillis-Steele prefix sum along the lane (last) axis, log2(G) steps."""
    g = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = x
    d = 1
    while d < g:
        if reverse:
            # pltpu.roll requires non-negative shifts; -d == g - d circularly.
            shifted = pltpu.roll(s, shift=g - d, axis=x.ndim - 1)
            s = s + jnp.where(lane < g - d, shifted, 0.0)
        else:
            shifted = pltpu.roll(s, shift=d, axis=x.ndim - 1)
            s = s + jnp.where(lane >= d, shifted, 0.0)
        d *= 2
    if not inclusive:
        s = s - x
    return s


def _pixel_coords(t, tiles_x):
    """Pixel centers of tile t as (256, 1) columns."""
    pixi = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    tx = t % tiles_x
    ty = t // tiles_x
    px = (tx * TILE + pixi % TILE).astype(jnp.float32)
    py = (ty * TILE + pixi // TILE).astype(jnp.float32)
    return px, py


def _chunk_geometry(rec, px, py, pos, end):
    """Shared forward/backward per-chunk alpha evaluation.

    rec: (NREC, G) records; px/py: (256, 1); pos: (1, G) absolute pair
    positions; end: scalar segment end.  Returns dict of (256, G)/(1, G)
    arrays.
    """
    mx, my = rec[R_MX : R_MX + 1, :], rec[R_MY : R_MY + 1, :]
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
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (pos < end)
    alpha = jnp.where(keep, alpha, 0.0)
    return dict(
        dx=dx, dy=dy, power=power, raw_alpha=raw_alpha, alpha=alpha,
        ca=ca, cb=cb, cc=cc, depth=rec[R_DEPTH : R_DEPTH + 1, :],
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    start_ref, end_ref,            # scalar prefetch (num_tiles,)
    records_ref,                   # (NREC, Pp) in HBM/ANY
    bg_ref,                        # (C, 1) VMEM
    img_ref,                       # (1, C, NPIX) out block
    depth_ref,                     # (1, NPIX, 1) out block
    tfin_ref,                      # (1, NPIX, 1) out block
    last_ref,                      # (1, NPIX, 1) int32 out block
    rec_buf, sem, tcar, failed,    # scratch
    *, tiles_x: int, G: int, C: int,
):
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    px, py = _pixel_coords(t, tiles_x)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    img_ref[0] = jnp.zeros((C, NPIX), jnp.float32)
    depth_ref[0] = jnp.zeros((NPIX, 1), jnp.float32)
    last_ref[0] = jnp.full((NPIX, 1), -1, jnp.int32)
    tcar[:] = jnp.ones((NPIX, 1), jnp.float32)
    failed[:] = jnp.zeros((NPIX, 1), jnp.float32)

    nchunks = (e - s + G - 1) // G

    # NOTE(round 2): a double-buffered variant (next chunk's DMA in flight
    # during compositing) deadlocked the chip through the axon tunnel; keep
    # the synchronous copy until that can be debugged on directly-attached
    # hardware.
    def body(k, carry):
        # Segment starts are chunk-aligned by construction (binning.py);
        # the hint lets Mosaic prove the HBM slice is tile-divisible.
        s0 = pl.multiple_of(s + k * G, G)
        cp = pltpu.make_async_copy(
            records_ref.at[:, pl.ds(s0, G)], rec_buf, sem
        )
        cp.start()
        cp.wait()
        pos = s0 + lane
        geo = _chunk_geometry(rec_buf[:], px, py, pos, e)
        alpha = geo["alpha"]

        z = jnp.log1p(-alpha)
        excl = _lane_cumsum(z, inclusive=False)
        t_excl = tcar[:] * jnp.exp(excl)
        fail = ((t_excl * (1.0 - alpha) < TRANSMITTANCE_EPS) & (alpha > 0.0)).astype(
            jnp.float32
        )
        failcnt = _lane_cumsum(fail, inclusive=True)
        contribute = (failcnt == 0.0) & (failed[:] == 0.0)
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
        failed[:] = jnp.maximum(failed[:], jnp.max(fail, axis=1, keepdims=True))
        lastp = jnp.max(
            jnp.where(contribute & (alpha > 0.0), pos, -1), axis=1, keepdims=True
        )
        last_ref[0] = jnp.maximum(last_ref[0], lastp)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)

    # Composite background over residual transmittance: (C,1)x(256,1)^T.
    img_ref[0] += jax.lax.dot_general(
        bg_ref[:], tcar[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    tfin_ref[0] = tcar[:]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    start_ref, end_ref,
    records_ref,                   # (NREC, Pp) HBM
    tfin_ref,                      # (1, NPIX, 1) block
    last_ref,                      # (1, NPIX, 1) int32 block
    gimg_ref,                      # (1, NPIX, C) block — pixel-major cotangent
    gdep_ref,                      # (1, NPIX, 1) block
    gtf_ref,                       # (1, NPIX, 1) block
    bg_ref,                        # (C, 1) VMEM
    grads_ref,                     # (NREC, Pp) HBM out
    rec_buf, gbuf, sem_in, sem_out, tback, gsum,
    *, tiles_x: int, G: int, C: int,
):
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    px, py = _pixel_coords(t, tiles_x)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    tfin = tfin_ref[0]          # (256, 1)
    last = last_ref[0]          # (256, 1) int32
    gimg = gimg_ref[0]          # (256, C)
    gdep = gdep_ref[0]          # (256, 1)
    gtf = gtf_ref[0]            # (256, 1)

    tback[:] = tfin
    # Gsum init: suffix "everything behind the last pair" = the background and
    # final-transmittance terms: T_final * (sum_c bg_c gimg_c + gtf).
    gsum[:] = tfin * (
        jax.lax.dot_general(
            gimg, bg_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + gtf
    )

    nchunks = (e - s + G - 1) // G

    def body(i, carry):
        k = nchunks - 1 - i
        s0 = pl.multiple_of(s + k * G, G)
        cp = pltpu.make_async_copy(records_ref.at[:, pl.ds(s0, G)], rec_buf, sem_in)
        cp.start()
        cp.wait()
        pos = s0 + lane
        geo = _chunk_geometry(rec_buf[:], px, py, pos, e)
        alpha = geo["alpha"]

        in_prefix = pos <= last                     # (256, G)
        az = jnp.where(in_prefix, jnp.log1p(-alpha), 0.0)
        # T just before each pair: T_chunk_end / prod_{j>=i}(1 - alpha_j).
        rev_incl = _lane_cumsum(az, inclusive=True, reverse=True)
        t_excl = tback[:] * jnp.exp(-rev_incl)
        w = jnp.where(in_prefix, alpha * t_excl, 0.0)

        # Per-pair scalarized output cotangent: c_hat = sum_c c_c gimg_c + d gdep.
        chat = gdep * geo["depth"]
        for c in range(C):
            chat += gimg[:, c : c + 1] * rec_buf[R_COLOR0 + c : R_COLOR0 + c + 1, :]
        wchat = w * chat
        suffix = gsum[:] + _lane_cumsum(wchat, inclusive=False, reverse=True)

        live = in_prefix & (alpha > 0.0)
        one_minus = jnp.where(live, 1.0 - alpha, 1.0)
        dalpha = jnp.where(live, t_excl * chat - suffix / one_minus, 0.0)
        unclamped = geo["raw_alpha"] < ALPHA_MAX
        dpower = jnp.where(unclamped, alpha * dalpha, 0.0)
        dop = jnp.where(unclamped & live, jnp.exp(geo["power"]) * dalpha, 0.0)

        dx, dy = geo["dx"], geo["dy"]
        ca, cb, cc = geo["ca"], geo["cb"], geo["cc"]
        red = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (1, G)
        gbuf[R_MX : R_MX + 1, :] = red((ca * dx + cb * dy) * dpower)
        gbuf[R_MY : R_MY + 1, :] = red((cc * dy + cb * dx) * dpower)
        gbuf[R_CA : R_CA + 1, :] = red(-0.5 * dx * dx * dpower)
        gbuf[R_CB : R_CB + 1, :] = red(-dx * dy * dpower)
        gbuf[R_CC : R_CC + 1, :] = red(-0.5 * dy * dy * dpower)
        gbuf[R_OP : R_OP + 1, :] = red(dop)
        gbuf[R_DEPTH : R_DEPTH + 1, :] = red(w * gdep)
        for c in range(C):
            gbuf[R_COLOR0 + c : R_COLOR0 + c + 1, :] = red(w * gimg[:, c : c + 1])
        for r in range(R_COLOR0 + C, NREC):
            gbuf[r : r + 1, :] = jnp.zeros((1, G), jnp.float32)

        out_cp = pltpu.make_async_copy(
            gbuf, grads_ref.at[:, pl.ds(s0, G)], sem_out
        )
        out_cp.start()
        out_cp.wait()

        # Move carries to the front boundary of this chunk.
        tback[:] = tback[:] * jnp.exp(-jnp.sum(az, axis=1, keepdims=True))
        gsum[:] = gsum[:] + jnp.sum(wchat, axis=1, keepdims=True)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)


# ---------------------------------------------------------------------------
# XLA wrappers + custom VJP
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pack_records(mean2d, conic, color, opacity, depth):
    c = color.shape[1]
    rows = [
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opacity, depth,
    ] + [color[:, i] for i in range(c)]
    rows += [jnp.zeros_like(opacity)] * (NREC - len(rows))
    return jnp.stack(rows, axis=0)  # (NREC, Pp)


def _composite_fwd_call(records, start, end, bg, *, num_tiles, tiles_x, G, C):
    pp = records.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, G=G, C=C)
    img, depth, tfin, last = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(start, end, records, bg)
    return img, depth, tfin, last


def _composite_bwd_call(
    records, start, end, bg, tfin, last, g_img_pix, g_dep, g_tf,
    *, num_tiles, tiles_x, G, C,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                     # records
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, C), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # bg
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.VMEM((NREC, G), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((NPIX, 1), jnp.float32),
            pltpu.VMEM((NPIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, G=G, C=C)
    (grads,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(records.shape, jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(start, end, records, tfin, last, g_img_pix, g_dep, g_tf, bg)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _composite(mean2d, conic, color, opacity, depth, bg, start, end, static):
    out, _ = _composite_fwd(mean2d, conic, color, opacity, depth, bg, start, end, static)
    return out


def _composite_fwd(mean2d, conic, color, opacity, depth, bg, start, end, static):
    num_tiles, tiles_x, G, C = static
    records = _pack_records(mean2d, conic, color, opacity, depth)
    bg2 = bg[:, None]
    img, dep, tfin, last = _composite_fwd_call(
        records, start, end, bg2, num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C
    )
    out = (img, dep[..., 0], tfin[..., 0])
    residuals = (records, start, end, bg2, tfin, last)
    return out, residuals


def _composite_bwd(static, residuals, cotangents):
    num_tiles, tiles_x, G, C = static
    records, start, end, bg2, tfin, last = residuals
    g_img, g_dep, g_tf = cotangents
    # Kernel wants pixel-major cotangents: (T, C, NPIX) -> (T, NPIX, C).
    g_img_pix = jnp.swapaxes(g_img, 1, 2)
    grads = _composite_bwd_call(
        records, start, end, bg2, tfin, last,
        g_img_pix, g_dep[..., None], g_tf[..., None],
        num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C,
    )
    # Tail positions beyond the last tile segment are never written by any
    # program — mask them (they carry uninitialized memory).
    seg_mask = jnp.zeros((records.shape[1],), bool)
    total = end[-1] if end.shape[0] else 0
    # Every position < aligned end of its tile is written; compute coverage
    # from (start, end) pairs without a scatter: positions < max aligned end.
    aligned_end = start + ((end - start + G - 1) // G) * G
    covered_until = jnp.max(aligned_end) if end.shape[0] else 0
    pos = jnp.arange(records.shape[1])
    seg_mask = pos < covered_until
    grads = jnp.where(seg_mask[None, :], grads, 0.0)

    d_mean2d = jnp.stack([grads[R_MX], grads[R_MY]], axis=-1)
    d_conic = jnp.stack([grads[R_CA], grads[R_CB], grads[R_CC]], axis=-1)
    d_color = jnp.moveaxis(grads[R_COLOR0 : R_COLOR0 + C], 0, 1)
    d_opacity = grads[R_OP]
    d_depth = grads[R_DEPTH]
    # bg cotangent: image += T_final * bg  =>  d_bg_c = sum T_final * g_img_c.
    d_bg = jnp.einsum("tcp,tp->c", g_img, tfin[..., 0])
    return (d_mean2d, d_conic, d_color, d_opacity, d_depth, d_bg, None, None)


_composite.defvjp(_composite_fwd, _composite_bwd)


# ---------------------------------------------------------------------------
# Per-Gaussian-boundary custom VJP (gather-free gradient routing)
# ---------------------------------------------------------------------------
#
# The vjp boundary wraps (per-Gaussian splat arrays -> tile images): forward
# gathers pair records by gid inside the boundary; backward routes per-PAIR
# gradients back to per-Gaussian gradients by an inverse-permutation gather
# (sorted position -> emission slot) followed by a masked per-Gaussian
# reduction over each Gaussian's contiguous emission slots — XLA's default
# transpose of the gathers would instead be millions of scatter-adds.


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _composite_g(
    mean2d_g, conic_g, color_g, opacity_g, depth_g, bg,
    gid, start, end, emit, q_of_slot, static,
):
    out, _ = _composite_g_fwd(
        mean2d_g, conic_g, color_g, opacity_g, depth_g, bg,
        gid, start, end, emit, q_of_slot, static,
    )
    return out


def _composite_g_fwd(
    mean2d_g, conic_g, color_g, opacity_g, depth_g, bg,
    gid, start, end, emit, q_of_slot, static,
):
    num_tiles, tiles_x, G, C, _max_span = static
    records = _pack_records(
        mean2d_g[gid], conic_g[gid], color_g[gid], opacity_g[gid], depth_g[gid]
    )
    bg2 = bg[:, None]
    img, dep, tfin, last = _composite_fwd_call(
        records, start, end, bg2, num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C
    )
    out = (img, dep[..., 0], tfin[..., 0])
    residuals = (records, start, end, bg2, tfin, last, emit, q_of_slot)
    return out, residuals


def _composite_g_bwd(static, residuals, cotangents):
    num_tiles, tiles_x, G, C, S = static
    records, start, end, bg2, tfin, last, emit, q_of_slot = residuals
    offsets, counts = emit
    g_img, g_dep, g_tf = cotangents
    g_img_pix = jnp.swapaxes(g_img, 1, 2)
    grads = _composite_bwd_call(
        records, start, end, bg2, tfin, last,
        g_img_pix, g_dep[..., None], g_tf[..., None],
        num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C,
    )  # (NREC, Pp) in padded pair order

    # Route to emission-slot order (pure gather), then reduce per Gaussian
    # over its contiguous slot range [offsets[g], offsets[g]+counts[g]).
    # Invalid slots map to clamped positions but are masked by counts;
    # unwritten tail positions are never referenced by valid slots.
    grads_slots = grads[:, q_of_slot]  # (NREC, max_pairs)
    slot_idx = offsets[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (N, S)
    slot_idx = jnp.clip(slot_idx, 0, q_of_slot.shape[0] - 1)
    mask = jnp.arange(S, dtype=jnp.int32)[None, :] < counts[:, None]

    def reduce_field(row):  # (max_pairs,) -> (N,)
        vals = row[slot_idx]  # (N, S)
        return jnp.sum(jnp.where(mask, vals, 0.0), axis=1)

    d_mx = reduce_field(grads_slots[R_MX])
    d_my = reduce_field(grads_slots[R_MY])
    d_ca = reduce_field(grads_slots[R_CA])
    d_cb = reduce_field(grads_slots[R_CB])
    d_cc = reduce_field(grads_slots[R_CC])
    d_op = reduce_field(grads_slots[R_OP])
    d_dep = reduce_field(grads_slots[R_DEPTH])
    d_cols = [reduce_field(grads_slots[R_COLOR0 + c]) for c in range(C)]

    d_mean2d = jnp.stack([d_mx, d_my], axis=-1)
    d_conic = jnp.stack([d_ca, d_cb, d_cc], axis=-1)
    d_color = jnp.stack(d_cols, axis=-1)
    d_bg = jnp.einsum("tcp,tp->c", g_img, tfin[..., 0])
    return (
        d_mean2d, d_conic, d_color, d_op, d_dep, d_bg,
        None, None, None, None, None,
    )


_composite_g.defvjp(_composite_g_fwd, _composite_g_bwd)


# ---------------------------------------------------------------------------
# Public renderer
# ---------------------------------------------------------------------------


def render_pallas(args, camera, bg=None, config: BinningConfig = BinningConfig()):
    """Full tiled render with Pallas compositing kernels."""
    c = args.colors.shape[1]
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)
    stream = build_pair_stream(args, camera, config)
    return composite_stream(stream, camera, config, bg)


def composite_stream(
    stream: PairStream,
    camera,
    config: BinningConfig,
    bg,
    g_colors=None,
    g_mean2d=None,
):
    """Composite a pre-built PairStream with the Pallas kernels.

    Optional overrides swap the per-Gaussian color source / mean2d lineage
    (used by render_dual)."""
    colors = stream.g_colors if g_colors is None else g_colors
    mean2d = stream.splats.mean2d if g_mean2d is None else g_mean2d
    c = colors.shape[1]
    if c > NREC - R_COLOR0:
        raise ValueError(f"at most {NREC - R_COLOR0} color channels supported")
    if config.chunk_pairs % 128 != 0:
        raise ValueError("chunk_pairs must be a multiple of 128 for the TPU kernel")
    if config.tile != TILE:
        raise ValueError(
            "the first-generation padded path is fixed at 16x16 tiles; use"
            " impl='pallas' for configurable tile sizes"
        )

    tiles_x, tiles_y = tile_grid(camera)
    num_tiles = tiles_x * tiles_y
    static = (num_tiles, tiles_x, config.chunk_pairs, c, config.max_span)
    img_tiles, depth_tiles, tfin_tiles = _composite_g(
        mean2d,
        stream.splats.conic,
        colors,
        stream.g_opacity,
        stream.splats.depth,
        bg,
        stream.gid,
        stream.start,
        stream.end,
        (stream.emit_offsets, stream.emit_counts),
        stream.q_of_slot,
        static,
    )

    def untile(x_tiles):  # (T, ..., NPIX) pixel-last layouts differ; handle both
        if x_tiles.ndim == 3 and x_tiles.shape[1] != NPIX:  # (T, C, NPIX)
            x = x_tiles.reshape(tiles_y, tiles_x, -1, TILE, TILE)
            x = jnp.transpose(x, (2, 0, 3, 1, 4)).reshape(
                -1, tiles_y * TILE, tiles_x * TILE
            )
            return x[:, : camera.height, : camera.width]
        x = x_tiles.reshape(tiles_y, tiles_x, TILE, TILE)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(tiles_y * TILE, tiles_x * TILE)
        return x[: camera.height, : camera.width]

    return RenderOutput(
        image=untile(img_tiles),
        depth=untile(depth_tiles),
        radii=stream.splats.radius,
        final_transmittance=untile(tfin_tiles),
        overflowed=stream.overflowed,
        span_overflowed=stream.span_overflowed,
    )
