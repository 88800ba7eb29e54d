"""Optimizer/schedule tests: warmup-cosine vs hand-computed torch SequentialLR
semantics, and stage-1 per-group Adam behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.train.optim import (
    STAGE1_BASE_LRS,
    apply_stage1_updates,
    make_stage1_adam,
    stage1_learning_rates,
    warmup_cosine_schedule,
)


class TestSchedule:
    def test_warmup_linear(self):
        s = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=110)
        # torch LinearLR(start_factor=1/1000): factor(0)=1e-3, factor(10)=1.0
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(5)) == pytest.approx(1e-3 + (1 - 1e-3) * 0.5)
        assert float(s(10)) == pytest.approx(1.0)

    def test_cosine_phase(self):
        s = warmup_cosine_schedule(2.0, warmup_steps=10, total_steps=110)
        # CosineAnnealingLR with T_max=100 counted from the milestone.
        assert float(s(10)) == pytest.approx(2.0)
        assert float(s(60)) == pytest.approx(1.0, abs=1e-5)   # halfway: cos(pi/2)
        assert float(s(110)) == pytest.approx(0.0, abs=1e-6)  # end: cos(pi)

    def test_monotonic_decrease_after_warmup(self):
        s = warmup_cosine_schedule(1.0, 5, 50)
        vals = [float(s(i)) for i in range(5, 51)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))


class TestStage1Adam:
    def test_segmentation_lr_is_zero(self):
        assert stage1_learning_rates(3.0)["segmentation_masks"] == 0.0

    def test_means_lr_scales_with_scene_radius(self):
        assert stage1_learning_rates(2.0)["means"] == pytest.approx(0.00016 * 2.0)

    def test_adam_moves_params_toward_negative_gradient(self):
        adam = make_stage1_adam()
        params = {k: jnp.ones((4, 3)) for k in STAGE1_BASE_LRS}
        state = adam.init(params)
        grads = {k: jnp.ones((4, 3)) for k in STAGE1_BASE_LRS}
        updates, state = adam.update(grads, state)
        new = apply_stage1_updates(params, updates, stage1_learning_rates(1.0))
        # Positive gradient -> parameter decreases (except frozen seg).
        assert float(new["means"][0, 0]) < 1.0
        assert float(new["segmentation_masks"][0, 0]) == 1.0
        # First Adam step magnitude ~= lr (bias-corrected m/sqrt(v) = 1).
        assert float(params["opacity_logits"][0, 0] - new["opacity_logits"][0, 0]) == pytest.approx(
            0.05, rel=1e-3
        )
