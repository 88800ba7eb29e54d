"""End-to-end smoke tests (BASELINE config 1 scaled down): a tiny stage-1 fit
and a tiny stage-2 training run, fully on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.types import Camera, activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.growth.densify import DensifyConfig
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig
from splatpu.train.stage1 import Stage1Config, fit, initialize_cloud
from splatpu.train.stage2 import Stage2Config, train

W = H = 32
BIN = BinningConfig(max_span=64, max_pairs=1 << 13, chunk_pairs=512)


@dataclasses.dataclass
class FakeView:
    w2c: np.ndarray
    K: np.ndarray
    width: int
    height: int
    image: np.ndarray
    segmentation: np.ndarray


def make_views(cloud, cameras):
    views = []
    args = activate_cloud(cloud)
    for cam in cameras:
        out = render(args, cam, impl="oracle")
        seg_args = args.replace(colors=cloud.segmentation_masks)
        seg_out = render(seg_args, cam, impl="oracle")
        views.append(
            FakeView(
                w2c=np.asarray(cam.w2c),
                K=np.asarray(cam.K),
                width=cam.width,
                height=cam.height,
                image=np.asarray(out.image),
                segmentation=np.asarray(seg_out.image),
            )
        )
    return views


def ring_cameras(n=4, radius=4.0):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        cams.append(
            make_lookat_camera(
                eye=(radius * np.sin(a), 0.5, -radius * np.cos(a)),
                width=W,
                height=H,
            )
        )
    return cams


class TestStage1EndToEnd:
    @pytest.mark.slow
    def test_fit_reduces_loss(self):
        truth = make_random_cloud(jax.random.key(0), 60, extent=0.8)
        cams = ring_cameras(4)
        views = make_views(truth, cams)

        # Initial point cloud: the truth means + rgb + seg, as (N, 7).
        pc = np.concatenate(
            [
                np.asarray(truth.means),
                np.asarray(truth.colors),
                (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
            ],
            axis=1,
        )
        cfg = Stage1Config(
            iterations=60,
            capacity_factor=2.0,
            renderer="stream",
            binning=BIN,
            densify=DensifyConfig(
                window_end=50, mutate_start=20, mutate_every=20, opacity_reset_every=10_000
            ),
        )
        history = []

        class Capture:
            def log(self, m, step):
                history.append({k: float(v) for k, v in m.items() if jnp.ndim(v) == 0})

            def flush(self):
                pass

        cloud, metrics = fit(pc, views, scene_radius=4.0, config=cfg, logger=Capture())
        first = np.mean([h["total_loss"] for h in history[:10]])
        last = np.mean([h["total_loss"] for h in history[-10:]])
        assert np.isfinite(last)
        assert last < first  # optimization made progress
        assert int(cloud.n_alive()) > 0


class TestStage1MultiView:
    @pytest.mark.slow
    def test_views_per_step_trains_and_densifies(self):
        """views_per_step=2: batched dual renders per step, densification
        statistics advance per view, loss falls."""
        truth = make_random_cloud(jax.random.key(3), 60, extent=0.8)
        cams = ring_cameras(4)
        views = make_views(truth, cams)
        pc = np.concatenate(
            [
                np.asarray(truth.means),
                np.asarray(truth.colors),
                (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
            ],
            axis=1,
        )
        cfg = Stage1Config(
            iterations=30,
            capacity_factor=2.0,
            renderer="stream",
            binning=BIN,
            views_per_step=2,
            densify=DensifyConfig(
                window_end=25, mutate_start=10, mutate_every=10,
                opacity_reset_every=10_000,
            ),
        )
        history = []

        class Capture:
            def log(self, m, step):
                history.append({k: float(v) for k, v in m.items() if jnp.ndim(v) == 0})

            def flush(self):
                pass

        cloud, metrics = fit(pc, views, scene_radius=4.0, config=cfg, logger=Capture())
        first = np.mean([h["total_loss"] for h in history[:5]])
        last = np.mean([h["total_loss"] for h in history[-5:]])
        assert np.isfinite(last)
        assert last < first
        assert int(cloud.n_alive()) > 0


class TestStage1BudgetGrowth:
    @pytest.mark.slow
    def test_overflow_grows_budget_and_training_continues(self):
        """Regression: the auto-growth path in fit() referenced an undefined
        `binning` local (NameError) — exercise growth end-to-end through fit."""
        truth = make_random_cloud(jax.random.key(2), 120, extent=0.8)
        cams = ring_cameras(2)
        views = make_views(truth, cams)
        pc = np.concatenate(
            [
                np.asarray(truth.means),
                np.asarray(truth.colors),
                (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
            ],
            axis=1,
        )
        # A deliberately starved pair budget: every view overflows.
        tiny = BinningConfig(max_span=4, max_pairs=128, chunk_pairs=128)
        cfg = Stage1Config(
            iterations=8,
            capacity_factor=2.0,
            renderer="stream",
            binning=tiny,
            grow_budget_on_overflow=True,
            overflow_check_every=2,
            max_budget_growths=2,
            densify=DensifyConfig(
                window_end=0, mutate_start=100, mutate_every=100,
                opacity_reset_every=10_000,
            ),
        )
        growth_events = []

        class Capture:
            def log(self, m, step):
                if "budget_growth" in m:
                    growth_events.append(dict(m))

            def flush(self):
                pass

        cloud, metrics = fit(pc, views, scene_radius=4.0, config=cfg, logger=Capture())
        assert growth_events, "starved budget never grew"
        assert growth_events[0]["max_pairs"] == 256  # doubled from 128
        assert np.isfinite(float(metrics["total_loss"]))


class TestStage2EndToEnd:
    @pytest.mark.slow
    def test_train_runs_and_improves(self):
        key = jax.random.key(1)
        base = make_random_cloud(key, 50, extent=0.7)
        cams = ring_cameras(6)
        t_count = 2

        # Ground-truth motion: rigid drift of the foreground.
        views_by_timestep = []
        for t in range(1, t_count + 1):
            moved = base.replace(
                means=base.means + jnp.asarray([0.02 * t, 0.0, 0.0])
            )
            views_by_timestep.append(make_views(moved, cams))

        cfg = Stage2Config(
            total_iterations=3,
            warmup_iterations=1,
            learning_rate=1e-3,
            hidden_dim=32,
            residual_blocks=1,
            views_per_step=3,
            timestep_count=t_count,
            renderer="stream",
            binning=BIN,
        )
        history = []

        class Capture:
            def log(self, m, step):
                history.append({k: float(v) for k, v in m.items()})

            def flush(self):
                pass

        net_params, cloud, enc_init, metrics = train(
            base, views_by_timestep, cfg, logger=Capture()
        )
        assert np.isfinite(history[-1]["total"])
        assert history[-1]["grad_norm"] > 0
        # Loss at final sequence iteration <= at first (learning happened).
        first = np.mean([h["total"] for h in history[:t_count]])
        last = np.mean([h["total"] for h in history[-t_count:]])
        assert last <= first * 1.2
