"""run_inference: orbit export + per-timestep real-view eval (reference
`train.py:550-637`), including mixed-resolution capture rigs."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.dynamics.deform import normalize_and_encode_means_and_rotations
from splatpu.dynamics.network import init_deformation_net
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig
from splatpu.train.inference import run_inference
from splatpu.train.stage2 import Stage2Config


class FakeView:
    pass


def _views_at(cloud, eye, w, h):
    cam = make_lookat_camera(eye=eye, width=w, height=h, focal=0.8 * w)
    img = render(activate_cloud(cloud), cam, impl="stream").image
    v = FakeView()
    v.w2c, v.K = np.asarray(cam.w2c), np.asarray(cam.K)
    v.width, v.height = w, h
    v.image = np.asarray(jnp.clip(img, 0, 1))
    return v


@pytest.mark.slow
def test_inference_mixed_resolution_eval(tmp_path):
    cloud = make_random_cloud(jax.random.key(0), 48)
    config = Stage2Config(
        total_iterations=1,
        warmup_iterations=1,
        hidden_dim=16,
        residual_blocks=1,
        timestep_count=2,
        renderer="stream",
        compute_dtype="float32",
        binning=BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256),
    )
    net_params = init_deformation_net(jax.random.key(1), config.net_config())
    enc = normalize_and_encode_means_and_rotations(
        cloud.means, cloud.rotation_quaternions, quirk_compat=config.quirk_compat
    )
    # Two real views per timestep at DIFFERENT resolutions (the reference
    # rebuilds render settings per view, `train.py:598-613`).
    views_by_timestep = [
        [
            _views_at(cloud, (0, 0.2, -3.5), 64, 48),
            _views_at(cloud, (1.0, 0.1, -3.3), 48, 32),
        ]
        for _ in range(2)
    ]
    frames, mean_losses = run_inference(
        net_params,
        cloud,
        enc,
        config,
        output_directory=None,
        views_by_timestep=views_by_timestep,
        width=64,
        height=48,
    )
    assert len(mean_losses) == 2
    assert all(np.isfinite(mean_losses))
    # 5 orbit cameras, timestep 0 prepended -> 3 frames each.
    assert len(frames) == 5
    assert all(len(f) == 3 for f in frames.values())


def _overflow_inference_setup(n_gaussians, max_pairs):
    import jax

    from splatpu.data.synthetic import make_random_cloud
    from splatpu.dynamics.deform import (
        normalize_and_encode_means_and_rotations,
    )
    from splatpu.dynamics.network import init_deformation_net
    from splatpu.render.binning import BinningConfig
    from splatpu.train.stage2 import Stage2Config

    cloud = make_random_cloud(jax.random.key(0), n_gaussians)
    tiny = BinningConfig(
        tile=32, max_span=64, max_pairs=max_pairs, chunk_pairs=128
    )
    cfg = Stage2Config(
        total_iterations=1, warmup_iterations=1, hidden_dim=16,
        residual_blocks=1, timestep_count=1, renderer="stream", binning=tiny,
    )
    params = init_deformation_net(jax.random.key(1), cfg.net_config())
    enc = normalize_and_encode_means_and_rotations(
        cloud.means, cloud.rotation_quaternions
    )
    return params, cloud, enc, cfg


def test_inference_grows_budget_on_overflow():
    """An undersized budget must GROW (bounded doubling, like both trainers)
    and re-render the overflowed batch instead of warning and truncating —
    round-4 upgrade of the round-2 warn-only behavior."""
    import warnings

    from splatpu.train.inference import run_inference

    params, cloud, enc, cfg = _overflow_inference_setup(300, max_pairs=128)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        frames, _ = run_inference(params, cloud, enc, cfg, width=64, height=64)
    assert not any("overflow" in str(c.message) for c in caught), [
        str(c.message) for c in caught
    ]
    assert len(frames) == 5
    for fs in frames.values():
        for f in fs:
            assert np.isfinite(np.asarray(f, np.float32)).all()


def test_inference_warns_when_growth_exhausted():
    """Demand beyond the growth allowance (4 doublings) must still surface
    the overflow loudly (the round-2 code discarded the flag entirely — a
    whole video could render truncated)."""
    import warnings

    from splatpu.train.inference import run_inference

    # 4000 Gaussians need far more than 128 * 2^4 = 2048 pair slots.
    params, cloud, enc, cfg = _overflow_inference_setup(4000, max_pairs=128)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_inference(params, cloud, enc, cfg, width=64, height=64)
    assert any("overflow" in str(c.message) for c in caught)
