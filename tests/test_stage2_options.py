"""Stage-2 step option equivalence: vmap view batching == sequential map."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.data.synthetic import make_random_cloud
from splatpu.render.binning import BinningConfig
from splatpu.train.stage2 import Stage2Config, make_train_step, setup, snapshot_previous
from tests.test_e2e import ring_cameras

BIN = BinningConfig(max_span=32, max_pairs=1 << 12, chunk_pairs=256)


def _run(view_batching):
    cloud = make_random_cloud(jax.random.key(0), 40)
    cams = ring_cameras(4)
    cfg = Stage2Config(
        total_iterations=1,
        warmup_iterations=1,
        hidden_dim=32,
        residual_blocks=1,
        views_per_step=3,
        timestep_count=2,
        renderer="stream",
        binning=BIN,
        view_batching=view_batching,
    )
    (
        dense_cloud, fg_idx, neighbor_info, enc_init,
        net_params, optimizer, opt_state,
    ) = setup(cloud, cfg)
    step = make_train_step(optimizer, cfg)
    all_w2c = jnp.stack([c.w2c for c in cams])
    all_K = jnp.stack([c.K for c in cams])
    h, w = cams[0].height, cams[0].width
    all_images = jnp.full((4, 3, h, w), 0.25)
    pick = np.array([0, 2, 3], np.int32)
    enc_prev, prev_fg = snapshot_previous(dense_cloud, fg_idx, neighbor_info)
    out = step(
        net_params, opt_state, enc_prev, prev_fg, np.float32(1.0),
        all_w2c, all_K, all_images, pick,
        cams[0], dense_cloud, enc_init, fg_idx, neighbor_info,
    )
    return out[4]  # aux metrics


@pytest.mark.slow
def test_vmap_matches_map():
    a = _run("map")
    b = _run("vmap")
    for k in ("l1", "ssim", "total", "grad_norm"):
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=2e-4, err_msg=k)


def _train(view_staging):
    from splatpu.train.stage2 import train
    from splatpu.data.dataset import ViewData

    cloud = make_random_cloud(jax.random.key(1), 40)
    cams = ring_cameras(4)
    h, w = cams[0].height, cams[0].width
    rng = np.random.default_rng(0)
    views_by_t = [
        [
            ViewData(
                camera_index=i, w2c=np.asarray(c.w2c), K=np.asarray(c.K),
                width=w, height=h,
                image=(np.round(rng.random((3, h, w)) * 255) / 255).astype(np.float32),
                segmentation=None,
            )
            for i, c in enumerate(cams)
        ]
        for _ in range(2)
    ]
    cfg = Stage2Config(
        total_iterations=2, warmup_iterations=1, hidden_dim=32,
        residual_blocks=1, views_per_step=3, timestep_count=2,
        renderer="stream", binning=BIN, view_staging=view_staging,
    )
    _, _, _, metrics = train(cloud, views_by_t, cfg)
    return metrics


@pytest.mark.slow
def test_view_staging_modes_equivalent():
    # Targets are exact 8-bit multiples, so all three staging modes must give
    # identical losses (same rng stream => same view picks).
    a = _train("device")
    b = _train("device_u8")
    c = _train("host")
    for k in ("l1", "total"):
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-5, err_msg=k)
        np.testing.assert_allclose(float(a[k]), float(c[k]), rtol=1e-6, err_msg=k)


def test_on_iteration_early_stop():
    """A truthy on_iteration return stops train() after that iteration
    (chunked execution support; round-4 tunnel-RSS post-mortem)."""
    import jax
    import numpy as np

    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.core.types import activate_cloud
    from splatpu.render.api import render
    from splatpu.train.stage2 import Stage2Config, train

    class V:
        pass

    cloud = make_random_cloud(jax.random.key(0), 48, extent=0.6)
    cam = make_lookat_camera(eye=(0.0, 0.3, -1.5), width=32, height=32, focal=32.0)
    img = np.clip(
        np.asarray(render(activate_cloud(cloud), cam, impl="stream").image),
        0.0, 1.0,
    )
    views = []
    for _t in range(2):
        v = V()
        v.camera_index = 0
        v.w2c, v.K = np.asarray(cam.w2c), np.asarray(cam.K)
        v.width, v.height = 32, 32
        v.image = img
        views.append([v])

    calls = []

    def stop_after_two(seq_it, net_params, cfg, metrics):
        calls.append(seq_it)
        return len(calls) >= 2

    cfg = Stage2Config(
        total_iterations=10, warmup_iterations=1, hidden_dim=16,
        residual_blocks=1, views_per_step=1, timestep_count=2,
        renderer="stream",
    )
    train(cloud, views, cfg, on_iteration=stop_after_two)
    assert calls == [0, 1]
