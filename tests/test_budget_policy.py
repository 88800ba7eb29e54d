"""Round-4 budget-policy fixes (ADVICE r3):

1. demand_binning caps the demand-sized max_span (one near-camera splat's
   pre-cull rect must not inflate the stream path's dense (N, max_span)
   emission domain to GB scale).
2. Span-overflow growth also doubles the exact path's big-class capacity
   (span_overflowed covers n_big > big_capacity, which doubling max_span
   alone can never clear).
3. Resume adopts a checkpointed budget when EITHER max_pairs or max_span
   grew (span-only growth was silently dropped before).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.render.api import demand_binning
from splatpu.render.binning import (
    BinningConfig,
    adopt_checkpointed_budget,
    grow_for_span_overflow,
)


class TestDemandSpanCap:
    def test_wide_splat_span_is_capped(self):
        cfg = demand_binning(100_000, demand_span=900)
        assert cfg.max_span == 512

    def test_cap_is_parameterizable(self):
        cfg = demand_binning(100_000, demand_span=900, span_cap=128)
        assert cfg.max_span == 128

    def test_normal_spans_unaffected(self):
        cfg = demand_binning(100_000, demand_span=60)
        assert cfg.max_span == 128  # pow2(60 * 2)

    def test_floor_at_default(self):
        cfg = demand_binning(100_000, demand_span=2)
        assert cfg.max_span >= BinningConfig().max_span

    def test_override_still_wins(self):
        cfg = demand_binning(
            100_000, demand_span=900, overrides={"max_span": 4096}
        )
        assert cfg.max_span == 4096


class TestSpanGrowth:
    def test_doubles_span_and_big_capacity(self):
        b = BinningConfig(max_span=64, big_capacity=128)
        g = grow_for_span_overflow(b, n=100_000)
        assert g.max_span == 128
        assert g.big_capacity == 256

    def test_resolves_default_big_capacity(self):
        b = BinningConfig(max_span=64)  # default cap for n=64_000: 4000
        g = grow_for_span_overflow(b, n=64_000)
        assert g.big_capacity == 8000

    def test_big_capacity_never_exceeds_n(self):
        b = BinningConfig(max_span=64, big_capacity=300)
        g = grow_for_span_overflow(b, n=400)
        assert g.big_capacity == 400

    def test_growth_clears_big_class_overflow(self):
        """End-to-end: a scene with more big Gaussians than capacity raises
        span_overflowed; one grow_for_span_overflow clears it."""
        from splatpu.core.types import activate_cloud
        from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
        from splatpu.render.api import render

        # Large scales => every Gaussian covers many tiles => all "big".
        cloud = make_random_cloud(
            jax.random.key(0), 64, extent=0.5, scale_range=(0.2, 0.4)
        )
        cam = make_lookat_camera(
            eye=(0.0, 0.0, 2.5), width=128, height=128, focal=128.0
        )
        cfg = BinningConfig(
            tile=16, max_span=64, span_small=2, big_capacity=4,
            max_pairs=1 << 14, chunk_pairs=128,
        )
        out = render(activate_cloud(cloud), cam, impl="pallas", config=cfg)
        assert bool(out.span_overflowed)
        grown = cfg
        for _ in range(5):
            grown = grow_for_span_overflow(grown, n=64)
            out2 = render(
                activate_cloud(cloud), cam, impl="pallas", config=grown
            )
            if not bool(out2.span_overflowed):
                break
        assert not bool(out2.span_overflowed)
        assert grown.big_capacity >= 64 or grown.max_span > cfg.max_span


class TestResumeAdoption:
    def test_pairs_growth_adopted(self):
        b = BinningConfig(max_pairs=1 << 16, max_span=64)
        a, changed = adopt_checkpointed_budget(b, 1 << 18, 64, n=10_000)
        assert changed and a.max_pairs == 1 << 18 and a.max_span == 64

    def test_span_only_growth_adopted(self):
        """ADVICE r3 low #2: span-only growth must trigger adoption."""
        b = BinningConfig(max_pairs=1 << 16, max_span=64)
        a, changed = adopt_checkpointed_budget(b, 1 << 16, 256, n=10_000)
        assert changed and a.max_span == 256
        # big_capacity re-derived from the span ratio (4x default).
        assert a.big_capacity == min(
            BinningConfig().resolved_big_capacity(10_000) * 4, 10_000
        )

    def test_no_growth_no_change(self):
        b = BinningConfig(max_pairs=1 << 16, max_span=64)
        a, changed = adopt_checkpointed_budget(b, 1 << 16, 64, n=10_000)
        assert not changed and a is b

    def test_smaller_checkpoint_budget_ignored(self):
        b = BinningConfig(max_pairs=1 << 16, max_span=64)
        a, changed = adopt_checkpointed_budget(b, 1 << 12, 16, n=10_000)
        assert not changed


class TestHeadKnobs:
    def test_zero_init_head_zero_deformation_without_residual(self):
        """delta_scale/zero_init_head/double_residual wiring: with
        zero-init + no double residual the t=0 deformation is exactly 0."""
        from splatpu.data.synthetic import make_random_cloud
        from splatpu.dynamics.deform import (
            normalize_and_encode_means_and_rotations,
            update_cloud_parameters,
        )
        from splatpu.dynamics.network import (
            DeformationNetConfig,
            init_deformation_net,
        )

        cloud = make_random_cloud(jax.random.key(1), 32)
        cfg = DeformationNetConfig(
            hidden_dim=16, residual_blocks=1,
            double_residual=False, zero_init_head=True, delta_scale=1.0,
        )
        params = init_deformation_net(jax.random.key(0), cfg)
        enc = normalize_and_encode_means_and_rotations(
            cloud.means, cloud.rotation_quaternions
        )
        out = update_cloud_parameters(
            params, cloud, enc, enc, jnp.float32(1.0), 10, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out.means), np.asarray(cloud.means), atol=0
        )

    def test_faithful_default_keeps_double_residual(self):
        """Default config reproduces the reference head: raw zero output
        still deforms by delta_scale * initial (the double residual)."""
        from splatpu.data.synthetic import make_random_cloud
        from splatpu.dynamics.deform import (
            normalize_and_encode_means_and_rotations,
            update_cloud_parameters,
        )
        from splatpu.dynamics.network import (
            DeformationNetConfig,
            init_deformation_net,
        )

        cloud = make_random_cloud(jax.random.key(1), 32)
        cfg = DeformationNetConfig(
            hidden_dim=16, residual_blocks=1, zero_init_head=True
        )
        assert cfg.delta_scale == 0.01 and cfg.double_residual
        params = init_deformation_net(jax.random.key(0), cfg)
        enc = normalize_and_encode_means_and_rotations(
            cloud.means, cloud.rotation_quaternions
        )
        out = update_cloud_parameters(
            params, cloud, enc, enc, jnp.float32(1.0), 10, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out.means),
            np.asarray(cloud.means) * 1.01,
            rtol=1e-6,
        )
