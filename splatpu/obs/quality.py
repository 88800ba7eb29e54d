"""Image-quality metrics for parity evaluation (PSNR; SSIM lives in core)."""

import jax.numpy as jnp


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))
