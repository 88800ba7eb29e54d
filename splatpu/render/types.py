"""Render output container shared by all renderer implementations."""

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RenderOutput:
    """Matches the reference rasterizer's (image, radii, depth) triple
    (`densify.py:119-126`, `train.py:354-361`) plus the final transmittance.

    image: (C, H, W) composited channels (RGB or any per-Gaussian vectors).
    depth: (H, W) expected view-space depth (sum of w_i * z_i).
    radii: (N,) float screen radii; 0 => culled/invisible this view.
    final_transmittance: (H, W) residual T after compositing (bg already added
        to `image`).
    overflowed: () bool — a tiled renderer's static binning budget
        (pair budget / span / big-capacity) was exceeded and some splats were
        dropped this view; raise the BinningConfig budgets if it persists.
        Always False for the oracle (no budgets).
    span_overflowed: () bool — specifically the per-Gaussian tile-SPAN budget
        (max_span, or the big-class capacity) was exceeded.  Kept separate
        from `overflowed` so budget auto-growth raises the budget that
        actually overflowed: one over-wide Gaussian must grow max_span, not
        double the (throughput-defining) pair budget.
    """

    image: jax.Array
    depth: jax.Array
    radii: jax.Array
    final_transmittance: jax.Array
    overflowed: jax.Array = struct.field(default_factory=lambda: jnp.array(False))
    span_overflowed: jax.Array = struct.field(
        default_factory=lambda: jnp.array(False)
    )
