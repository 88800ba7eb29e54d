"""Render output container shared by all renderer implementations."""

import jax
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
    """

    image: jax.Array
    depth: jax.Array
    radii: jax.Array
    final_transmittance: jax.Array
