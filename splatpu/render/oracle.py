"""Naive O(N * pixels) differentiable renderer — the in-repo oracle.

Implements exactly the compositing semantics of the CUDA render kernel
(SURVEY.md §2.1 steps 1+3, [reconstructed]) with no tiling or binning: every
Gaussian is evaluated at every pixel, sorted globally by view-space depth,
composited front-to-back with the serial early-termination rule
(a Gaussian whose compositing would drop T below 1e-4 is dropped and
everything behind it is skipped).

Only for small scenes (tests, finite differences); memory is O(N * H * W).
Fully differentiable via autodiff, including the `means2d_offset` screen-space
gradient collector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splatpu.core.projection import (
    TRANSMITTANCE_EPS,
    evaluate_alpha,
    preprocess,
    tile_rect,
)
from splatpu.core.types import Camera, RenderArgs
from splatpu.render.types import RenderOutput


def render_oracle(args: RenderArgs, camera: Camera, bg=None) -> RenderOutput:
    n = args.n
    c = args.colors.shape[1]
    h, w = camera.height, camera.width
    if bg is None:
        bg = jnp.zeros((c,), jnp.float32)

    sp = preprocess(args, camera)

    # Global front-to-back order; invisible Gaussians pushed to the far end
    # with alpha forced to 0.
    sort_depth = jnp.where(sp.visible, sp.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    order = jax.lax.stop_gradient(order)

    mean2d = sp.mean2d[order]          # (N, 2)
    conic = sp.conic[order]            # (N, 3)
    depth = sp.depth[order]            # (N,)
    colors = args.colors[order]        # (N, C)
    opacity = jnp.where(sp.visible, args.opacities[:, 0], 0.0)[order]  # (N,)

    # Pixel centers (the CUDA kernel compares against integer pixel coords).
    px = jnp.arange(w, dtype=jnp.float32)
    py = jnp.arange(h, dtype=jnp.float32)
    dx = px[None, None, :] - mean2d[:, 0][:, None, None]  # (N, H, W) via bcast
    dy = py[None, :, None] - mean2d[:, 1][:, None, None]
    alpha = evaluate_alpha(
        conic[:, 0][:, None, None],
        conic[:, 1][:, None, None],
        conic[:, 2][:, None, None],
        opacity[:, None, None],
        dx,
        dy,
    )  # (N, H, W)

    # Tile-rect culling: the CUDA kernel only composites a Gaussian into the
    # 16x16 tiles its 3-sigma rect covers, even where alpha clears 1/255.
    tiles_x = -(-w // 16)
    tiles_y = -(-h // 16)
    tx0, ty0, tx1, ty1 = tile_rect(mean2d, sp.radius[order], tiles_x, tiles_y)
    ptx = (jnp.arange(w) // 16)[None, None, :]
    pty = (jnp.arange(h) // 16)[None, :, None]
    in_rect = (
        (ptx >= tx0[:, None, None])
        & (ptx < tx1[:, None, None])
        & (pty >= ty0[:, None, None])
        & (pty < ty1[:, None, None])
    )
    alpha = jnp.where(in_rect, alpha, 0.0)

    one_minus = 1.0 - alpha
    # Exclusive cumulative transmittance along the depth-sorted axis.
    t_incl = jnp.cumprod(one_minus, axis=0)
    t_excl = jnp.concatenate([jnp.ones((1, h, w)), t_incl[:-1]], axis=0)
    # Serial early-termination: gaussian i contributes iff no j <= i would have
    # driven T below the epsilon.
    fail = t_excl * one_minus < TRANSMITTANCE_EPS
    contribute = jnp.logical_not(jnp.cumsum(fail.astype(jnp.int32), axis=0) > 0)
    contribute = jax.lax.stop_gradient(contribute)

    weights = jnp.where(contribute, alpha * t_excl, 0.0)  # (N, H, W)
    hi = jax.lax.Precision.HIGHEST  # keep the contraction in f32 on TPU MXUs
    image = jnp.einsum("nhw,nc->chw", weights, colors, precision=hi)
    depth_map = jnp.einsum("nhw,n->hw", weights, depth, precision=hi)
    t_final = jnp.prod(jnp.where(contribute, one_minus, 1.0), axis=0)  # (H, W)
    image = image + t_final[None] * bg[:, None, None]

    return RenderOutput(
        image=image,
        depth=depth_map,
        radii=sp.radius,
        final_transmittance=t_final,
    )
