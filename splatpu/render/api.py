"""Public render entry point.

`render(args, camera, bg, impl=...)` mirrors the reference call
`Renderer(raster_settings)(**render_arguments) -> (image, radii, depth)`
(`densify.py:119-126`, `train.py:354-361`) but returns a `RenderOutput`
pytree and is a pure differentiable function:

- gradients flow to means3d / colors / opacities / scales / rotations and to
  `means2d_offset` (the screen-space NDC gradient collector densification
  reads, replacing the reference's `means2D.retain_grad()` trick).

Implementations:
- "oracle": O(N*pixels) naive renderer; small scenes / tests only.
- "stream": tiled XLA binning + pair-stream compositing; runs on CPU and TPU.
- "pallas": exact-budget binning + window-masked Pallas compositing kernels
            (fastest on TPU; see render/exact.py).
- "pallas_padded": first-generation chunk-aligned Pallas path (kept for A/B).
- "auto":   pallas on TPU, stream elsewhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from splatpu.core.types import Camera, RenderArgs
from splatpu.render.binning import DEFAULT_TILE, BinningConfig
from splatpu.render.oracle import render_oracle
from splatpu.render.stream import render_stream
from splatpu.render.types import RenderOutput


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def render(
    args: RenderArgs,
    camera: Camera,
    bg=None,
    impl: str = "auto",
    config: BinningConfig | None = None,
) -> RenderOutput:
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "stream"
    if config is None:
        # The first-generation padded path is fixed at 16x16 tiles.
        tile = 16 if impl == "pallas_padded" else DEFAULT_TILE
        config = default_config(args.n, tile=tile)
    if impl == "oracle":
        return render_oracle(args, camera, bg)
    if impl == "stream":
        return render_stream(args, camera, bg, config)
    if impl == "pallas":
        from splatpu.render.exact import render_pallas_exact

        return render_pallas_exact(args, camera, bg, config)
    if impl == "pallas_padded":
        from splatpu.render.pallas_composite import render_pallas

        return render_pallas(args, camera, bg, config)
    raise ValueError(f"unknown renderer impl: {impl!r}")


def render_dual(
    args: RenderArgs,
    colors_b: jax.Array,
    camera: Camera,
    bg=None,
    impl: str = "auto",
    config: BinningConfig | None = None,
) -> tuple[RenderOutput, RenderOutput]:
    """Two composites over ONE shared preprocess+binning: the primary render
    uses ``args.colors``, the secondary uses ``colors_b`` (per-Gaussian
    vectors, e.g. segmentation masks, `densify.py:136-151`).

    Gradient contract matches the reference exactly: the ``means2d_offset``
    screen-gradient collector receives cotangents from the PRIMARY render only
    (`densify.py:130-132` retains grad only on the color render); all other
    parameters receive gradients from both.

    Geometry (projection, sort, tile ranges) is computed once — for stage-1
    training this halves the per-step binning cost.
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "stream"
    if config is None:
        tile = 16 if impl == "pallas_padded" else DEFAULT_TILE
        config = default_config(args.n, tile=tile)
    if impl == "oracle":
        out_a = render_oracle(args, camera, bg)
        seg_args = args.replace(
            colors=colors_b,
            means2d_offset=jax.lax.stop_gradient(args.means2d_offset),
        )
        return out_a, render_oracle(seg_args, camera, bg)

    c = args.colors.shape[1]
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)

    if impl == "pallas":
        from splatpu.render.exact import build_exact_stream, composite_exact

        estream = build_exact_stream(args, camera, config)
        off = args.means2d_offset
        wh = jnp.array([camera.width, camera.height], jnp.float32) * 0.5
        mean2d_b = estream.splats.mean2d + (jax.lax.stop_gradient(off) - off) * wh
        return (
            composite_exact(estream, camera, config, bg),
            composite_exact(
                estream, camera, config, bg, g_colors=colors_b, g_mean2d=mean2d_b
            ),
        )

    from splatpu.render.binning import build_pair_stream, gather_pair_records

    stream = build_pair_stream(args, camera, config)
    # Secondary mean2d: numerically identical but its AD lineage drops the
    # offset (offset enters pixels linearly: mean2d = base + off * wh/2).
    off = args.means2d_offset
    wh = jnp.array([camera.width, camera.height], jnp.float32) * 0.5
    mean2d_b = stream.splats.mean2d + (jax.lax.stop_gradient(off) - off) * wh

    if impl == "stream":
        from splatpu.render.stream import composite_pairs

        def composite(records):
            image, depth, t_final = composite_pairs(
                stream, camera, config, bg, records=records
            )
            return RenderOutput(
                image=image,
                depth=depth,
                radii=stream.splats.radius,
                final_transmittance=t_final,
                overflowed=stream.overflowed,
                span_overflowed=stream.span_overflowed,
            )

        return (
            composite(gather_pair_records(stream)),
            composite(
                gather_pair_records(stream, g_colors=colors_b, g_mean2d=mean2d_b)
            ),
        )

    from splatpu.render.pallas_composite import composite_stream

    return (
        composite_stream(stream, camera, config, bg),
        composite_stream(
            stream, camera, config, bg, g_colors=colors_b, g_mean2d=mean2d_b
        ),
    )


def default_config(n_gaussians: int, tile: int = DEFAULT_TILE) -> BinningConfig:
    """Product-default binning: 32px tiles with a ~4-pairs-per-Gaussian
    budget (16px tiles need ~8: measured 664k vs 318k pairs at the 100k/720p
    bench scene).  Budgets are rounded up to the chunk size — every
    binning/routing/gather domain scales linearly with the budget, so an
    exact multiple beats the next power of two by up to 2x.  Scenes that
    blow the budget surface `RenderOutput.overflowed` (stage 1 auto-grows
    the budget on overflow)."""
    chunk = 128 if tile <= 16 else 256  # measured fastest per tile size (v5e)
    cfg = BinningConfig(tile=tile, chunk_pairs=chunk)
    per_gaussian = 8 if tile <= 16 else 4
    budget = min(max(n_gaussians * per_gaussian, 1 << 12), 1 << 21)
    budget = -(-budget // chunk) * chunk
    return dataclasses.replace(cfg, max_pairs=budget)


def resolve_binning(
    n_gaussians: int,
    config: BinningConfig | None = None,
    overrides: dict | None = None,
) -> BinningConfig:
    """An explicit config wins; otherwise the n-scaled default heuristic with
    individual field `overrides` applied ON TOP (a single CLI flag like
    --tile must not discard the budget heuristic for every other field)."""
    if config is not None:
        return config
    ov = dict(overrides or {})
    tile = ov.pop("tile", DEFAULT_TILE)
    return dataclasses.replace(default_config(n_gaussians, tile=tile), **ov)


def measure_binning_demand(
    args: RenderArgs,
    camera_static: Camera,
    w2cs: jax.Array,     # (C, 4, 4)
    Ks: jax.Array,       # (C, 3, 3)
    tile: int = DEFAULT_TILE,
) -> tuple[int, int]:
    """Measured pair demand over a camera set: (max total pairs, max tiles
    covered by a single Gaussian), pre-culling upper bounds.

    The CUDA binner sizes its buffers from an InclusiveSum of per-Gaussian
    tile counts every frame (SURVEY.md §2.1 step 2) and so can never drop a
    splat.  On TPU the buffers are shape-defining, so the equivalent is:
    measure the demand once at setup (one cheap preprocess per camera, no
    compositing) and size the static budget from it with headroom — plus
    grow-on-overflow as the runtime backstop.
    """
    from splatpu.core.projection import preprocess, tile_rect

    tiles_x = -(-camera_static.width // tile)
    tiles_y = -(-camera_static.height // tile)

    @jax.jit
    def demand(args, w2cs, Ks):
        def one(w2c, K):
            cam = camera_static.replace(w2c=w2c, K=K)
            sp = preprocess(args, cam)
            tx0, ty0, tx1, ty1 = tile_rect(
                sp.mean2d, sp.radius, tiles_x, tiles_y, tile
            )
            count = jnp.where(sp.visible, (tx1 - tx0) * (ty1 - ty0), 0)
            return jnp.sum(count), jnp.max(count)

        totals, spans = jax.vmap(one)(w2cs, Ks)
        return jnp.max(totals), jnp.max(spans)

    total, span = demand(args, jnp.asarray(w2cs), jnp.asarray(Ks))
    return int(total), int(span)


def demand_binning(
    demand_pairs: int,
    demand_span: int,
    tile: int = DEFAULT_TILE,
    headroom: float = 2.0,
    overrides: dict | None = None,
    span_cap: int = 512,
) -> BinningConfig:
    """Binning config sized from measured demand (`measure_binning_demand`)
    with multiplicative headroom (the cloud moves during stage-2 training;
    deformation deltas are small — 0.01-scaled, `train.py:303-307` — so 2x
    covers drift, and grow-on-overflow backstops the rest)."""
    ov = dict(overrides or {})
    tile = ov.pop("tile", tile)
    base = default_config(1, tile=tile)
    chunk = base.chunk_pairs
    budget = max(int(demand_pairs * headroom), 1 << 12)
    budget = min(budget, 1 << 24)           # grid-kernel f32-exact guard
    budget = -(-budget // chunk) * chunk
    budget = min(budget, 1 << 24)
    # Span: next power of two above demand (x2 drift headroom), floor at the
    # default so span_small two-class routing stays effective — CAPPED: the
    # measured span is a pre-cull upper bound, and one near-camera splat
    # covering most of the screen (720p/t32 = 920 tiles) would otherwise set
    # max_span into the thousands and make the stream path's dense
    # (N, max_span) emission domain tens of GB at large N.  Genuinely wider
    # splats are handled by the exact path's big-class split plus
    # grow-on-overflow at runtime, which only pays when a splat actually
    # KEEPS that many tiles post-cull.
    span = max(int(demand_span * 2), base.max_span)
    span = 1 << (span - 1).bit_length()
    span = max(base.max_span, min(span, 1 << (max(span_cap, 1) - 1).bit_length()))
    cfg = dataclasses.replace(base, max_pairs=budget, max_span=span)
    return dataclasses.replace(cfg, **ov)
