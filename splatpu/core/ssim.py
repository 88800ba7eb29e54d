"""Windowed SSIM, numerically matching the reference (`external.py:49-110`).

11x11 Gaussian window (sigma=1.5, normalized to sum 1), zero 'SAME' padding,
per-channel (grouped) convolution, c1=0.01^2, c2=0.03^2.  On TPU the five
depthwise convolutions fuse into a handful of VPU-friendly ops under jit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_conv_same(img, window):
    """img: (B, C, H, W); window: (Kh, Kw) applied per channel with zero padding."""
    c = img.shape[1]
    kernel = jnp.broadcast_to(window, (c, 1) + window.shape)  # (C, 1, Kh, Kw)
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5, size_average: bool = True):
    """SSIM between images shaped (C, H, W) or (B, C, H, W), in [0, 1]-ish range.

    Returns a scalar mean (size_average=True, the only mode the reference uses)
    or per-batch means otherwise.
    """
    squeeze = img1.ndim == 3
    if squeeze:
        img1 = img1[None]
        img2 = img2[None]
    window = jnp.asarray(_gaussian_window(window_size, sigma), img1.dtype)

    conv = functools.partial(_depthwise_conv_same, window=window)
    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
