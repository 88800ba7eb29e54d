"""Loss functions for both training stages.

- image loss (both stages): 0.8 * L1 + 0.2 * (1 - SSIM)
  (`densify.py:127-129`, `train.py:391-392`)
- stage-1 total: image + 3 * segmentation, where the segmentation term renders
  the per-Gaussian segmentation masks as "colors" (`densify.py:136-151,183`)
- stage-2 total: 0.8 * sum_views L1 + 0.2 * sum_views SSIM-loss
  + 3 * sum_views rigidity (`train.py:395-429`; rigidity is identical per view
  so the sum is views * rigidity — preserved exactly).
"""

from __future__ import annotations

import jax.numpy as jnp

from splatpu.core.ssim import ssim

L1_WEIGHT = 0.8
SSIM_WEIGHT = 0.2
SEGMENTATION_WEIGHT = 3.0
RIGIDITY_WEIGHT = 3.0


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def image_loss(rendered, target):
    return L1_WEIGHT * l1_loss(rendered, target) + SSIM_WEIGHT * (
        1.0 - ssim(rendered, target)
    )
