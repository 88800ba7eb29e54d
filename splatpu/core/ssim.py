"""Windowed SSIM, numerically matching the reference (`external.py:49-110`).

11x11 Gaussian window (sigma=1.5, normalized to sum 1), zero 'SAME' padding,
per-channel (grouped) convolution, c1=0.01^2, c2=0.03^2.  The reference's 2D
window is `outer(g, g)` (`external.py:55-58`), i.e. exactly separable: the
depthwise convolution runs as two 1D 11-tap passes (rows then columns) — the
same result with 5.5x fewer taps, which matters because depthwise convs run
on the VPU, not the MXU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur1d(img, window: np.ndarray, axis: int):
    """Zero-padded 'SAME' 1D blur along `axis` as k shifted scaled adds.

    XLA's grouped-conv lowering on TPU is ~100x off VPU speed-of-light for
    depthwise filters; k static slices + fused multiply-adds hit it."""
    k = window.shape[0]
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    p = jnp.pad(img, pad)
    out = None
    for d in range(k):
        term = float(window[d]) * jax.lax.slice_in_dim(
            p, d, d + img.shape[axis], axis=axis
        )
        out = term if out is None else out + term
    return out


def _depthwise_conv_same(img, window: np.ndarray):
    """img: (B, C, H, W); separable window applied per channel, zero 'SAME'
    padding.  `window` is the 1D row; the 2D window is outer(window, window)."""
    return _blur1d(_blur1d(img, window, 2), window, 3)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5, size_average: bool = True):
    """SSIM between images shaped (C, H, W) or (B, C, H, W), in [0, 1]-ish range.

    Returns a scalar mean (size_average=True, the only mode the reference uses)
    or per-batch means otherwise.
    """
    squeeze = img1.ndim == 3
    if squeeze:
        img1 = img1[None]
        img2 = img2[None]
    window = _gaussian_1d(window_size, sigma)  # host-side taps -> scaled adds

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
