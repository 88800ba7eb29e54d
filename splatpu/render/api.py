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
- "pallas": tiled binning + Pallas TPU compositing kernels (fastest on TPU).
- "auto":   pallas on TPU, stream elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from splatpu.core.types import Camera, RenderArgs
from splatpu.render.binning import BinningConfig
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
        config = default_config(args.n)
    if impl == "oracle":
        return render_oracle(args, camera, bg)
    if impl == "stream":
        return render_stream(args, camera, bg, config)
    if impl == "pallas":
        from splatpu.render.pallas_composite import render_pallas

        return render_pallas(args, camera, bg, config)
    raise ValueError(f"unknown renderer impl: {impl!r}")


def default_config(n_gaussians: int) -> BinningConfig:
    """Pair budget heuristic: ~8 tiles per Gaussian, power-of-two, bounded.
    Check `PairStream.overflowed` for scenes that blow the budget."""

    def next_pow2(x):
        return 1 << max(12, (int(x) - 1).bit_length())

    budget = min(max(n_gaussians * 8, 1 << 12), 1 << 21)
    return BinningConfig(max_pairs=next_pow2(budget))
