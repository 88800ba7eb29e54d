"""Optimizers and schedules.

Stage 1: per-parameter-group Adam (eps=1e-15) with the reference's learning
rates (`densify.py:68-86`), expressed as optax `scale_by_adam` + per-leaf lr
scaling so densification can surgically edit the mu/nu moment trees
(see `splatpu.growth.densify`).

Stage 2: Adam + SequentialLR(LinearLR warmup 1/1000 -> CosineAnnealingLR)
(`train.py:138-152,703-710`) as an optax schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax


STAGE1_BASE_LRS = {
    # `densify.py:69-78`; means lr additionally scales by scene_radius.
    "means": 0.00016,
    "colors": 0.0025,
    "segmentation_masks": 0.0,
    "rotation_quaternions": 0.001,
    "opacity_logits": 0.05,
    "log_scales": 0.001,
}


def stage1_learning_rates(scene_radius: float) -> dict[str, float]:
    lrs = dict(STAGE1_BASE_LRS)
    lrs["means"] = lrs["means"] * float(scene_radius)
    return lrs


def make_stage1_adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """Raw Adam moment transform over the cloud parameter dict; the caller
    applies per-group lrs with `apply_stage1_updates`."""
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)


def apply_stage1_updates(params, scaled_updates, learning_rates):
    """params := params - lr_k * adam_update_k for each group k."""
    return {
        k: params[k] - learning_rates[k] * scaled_updates[k] for k in params
    }


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """Replicates torch SequentialLR(LinearLR(start_factor=1/1000,
    total_iters=W), CosineAnnealingLR(T_max=total-W)) exactly
    (`train.py:138-152`):

    - LinearLR at step s < W multiplies base lr by
      (1/1000) + (1 - 1/1000) * min(s, W) / W ... torch's LinearLR linearly
      interpolates the factor from start_factor at s=0 to 1.0 at s=W;
    - CosineAnnealingLR then runs with T_max = total - W:
      lr(s) = base * (1 + cos(pi * (s - W) / T_max)) / 2, floor eta_min=0.
    """
    start_factor = 1.0 / 1000.0
    t_max = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.float32(max(warmup_steps, 1))
        warm = base_lr * (
            start_factor + (1.0 - start_factor) * jnp.minimum(step, w) / w
        )
        cos_step = jnp.maximum(step - warmup_steps, 0.0)
        cosine = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * cos_step / t_max))
        return jnp.where(step < warmup_steps, warm, cosine)

    return schedule


def make_stage2_optimizer(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=warmup_cosine_schedule(learning_rate, warmup_steps, total_steps)
    )


def stage2_lr_at(
    base_lr: float, warmup_steps: int, total_steps: int, step: int
) -> float:
    """Host-side float of `warmup_cosine_schedule` at an update count, for
    per-step lr logging (the reference logs the scheduler lr every step,
    `train.py:758`) without touching the device."""
    import math

    start_factor = 1.0 / 1000.0
    t_max = max(total_steps - warmup_steps, 1)
    w = max(warmup_steps, 1)
    if step < warmup_steps:
        return base_lr * (start_factor + (1.0 - start_factor) * min(step, w) / w)
    return base_lr * 0.5 * (1.0 + math.cos(math.pi * (step - warmup_steps) / t_max))
