"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4):
camera-sharded losses must match the single-device computation exactly, and
the full sharded train step must run and produce finite results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.dist.mesh import get_mesh
from splatpu.dist.sharding import make_camera_sharded_image_losses, pad_views
from splatpu.dist.train_step import make_sharded_train_step
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig
from splatpu.core.ssim import ssim
from splatpu.train.stage2 import Stage2Config, setup, snapshot_previous

BIN = BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256)
W = H = 32


def ring_cameras(n):
    return [
        make_lookat_camera(
            eye=(4.0 * np.sin(a), 0.4, -4.0 * np.cos(a)), width=W, height=H
        )
        for a in np.linspace(0, 2 * np.pi, n, endpoint=False)
    ]


def test_mesh_shapes():
    mesh = get_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("cameras", "tiles")


def test_sharded_image_losses_match_single_device():
    mesh = get_mesh()
    n_dev = mesh.shape["cameras"]
    cams = ring_cameras(n_dev)
    cloud = make_random_cloud(jax.random.key(0), 40)
    args = activate_cloud(cloud)

    w2c = jnp.stack([c.w2c for c in cams])
    K = jnp.stack([c.K for c in cams])
    images = jnp.stack(
        [render(args, c, impl="stream", config=BIN).image for c in cams]
    )
    target = images * 0.9  # nontrivial loss
    weights = jnp.ones((n_dev,))

    sharded = make_camera_sharded_image_losses(mesh, cams[0], "stream", BIN)
    l1_s, ssim_s, _overflow, _span = jax.jit(sharded)(
        args, w2c, K, target, weights
    )

    # Single-device reference.
    l1_ref = 0.0
    ssim_ref = 0.0
    for i, cam in enumerate(cams):
        out = render(args, cam, impl="stream", config=BIN)
        l1_ref += jnp.mean(jnp.abs(out.image - target[i]))
        ssim_ref += 1.0 - ssim(out.image, target[i])
    # f32 summation-order differences across devices: ~1e-4 relative.
    np.testing.assert_allclose(float(l1_s), float(l1_ref), rtol=1e-3)
    np.testing.assert_allclose(float(ssim_s), float(ssim_ref), rtol=1e-3)


def test_padding_and_masking():
    mesh = get_mesh()
    n_dev = mesh.shape["cameras"]
    cams = ring_cameras(3)  # deliberately not divisible by the mesh
    cloud = make_random_cloud(jax.random.key(1), 30)
    args = activate_cloud(cloud)
    w2c = jnp.stack([c.w2c for c in cams])
    K = jnp.stack([c.K for c in cams])
    images = jnp.zeros((3, 3, H, W))
    w2c, K, images, weights = pad_views(w2c, K, images, n_dev)
    assert w2c.shape[0] % n_dev == 0
    assert float(weights.sum()) == 3.0

    sharded = make_camera_sharded_image_losses(mesh, cams[0], "stream", BIN)
    l1_s, _, _, _ = jax.jit(sharded)(args, w2c, K, images, weights)
    l1_ref = sum(
        jnp.mean(jnp.abs(render(args, c, impl="stream", config=BIN).image))
        for c in cams
    )
    np.testing.assert_allclose(float(l1_s), float(l1_ref), rtol=1e-5)


def test_full_sharded_train_step():
    mesh = get_mesh()
    n_dev = mesh.shape["cameras"]
    cams = ring_cameras(max(4, n_dev))
    cloud = make_random_cloud(jax.random.key(2), 40)
    config = Stage2Config(
        total_iterations=2,
        warmup_iterations=1,
        hidden_dim=32,
        residual_blocks=1,
        views_per_step=len(cams),
        timestep_count=2,
        renderer="stream",
        binning=BIN,
    )
    (
        dense_cloud, fg_idx, neighbor_info, enc_init,
        net_params, optimizer, opt_state,
    ) = setup(cloud, config)
    step = make_sharded_train_step(optimizer, config, mesh, cams[0])
    w2c = jnp.stack([c.w2c for c in cams])
    K = jnp.stack([c.K for c in cams])
    images = jnp.full((len(cams), 3, H, W), 0.3)
    v = len(cams)
    pad = (-v) % n_dev
    pick = jnp.concatenate(
        [jnp.arange(v, dtype=jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    weights = jnp.concatenate([jnp.ones((v,)), jnp.zeros((pad,))])
    enc_prev, prev_fg = snapshot_previous(dense_cloud, fg_idx, neighbor_info)

    new_params, opt_state, enc_prev, prev_fg, aux = step(
        net_params, opt_state, enc_prev, prev_fg,
        jnp.float32(1.0), w2c, K, images, pick, weights,
        dense_cloud, enc_init, fg_idx, neighbor_info,
    )
    assert np.isfinite(float(aux["total"]))
    assert float(aux["grad_norm"]) > 0
    # Parameters actually moved.
    delta = sum(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(net_params))
    )
    assert delta > 0


# ---------------------------------------------------------------------------
# Product wiring: distributed training reachable from the trainers
# (VERDICT r1 item 2 — the dist/ layer must be callable from stage2.train()
# and stage1.fit(), and match the single-device trajectory).
# ---------------------------------------------------------------------------


def _tiny_views(n_cams, n_timesteps, rng):
    """views_by_timestep for stage2.train: random fixed targets suffice for
    trajectory equivalence (the optimizer sees identical losses either way)."""
    from splatpu.data.dataset import ViewData

    cams = ring_cameras(n_cams)
    views = []
    for _t in range(n_timesteps):
        step_views = []
        for i, c in enumerate(cams):
            step_views.append(
                ViewData(
                    camera_index=i,
                    w2c=np.asarray(c.w2c),
                    K=np.asarray(c.K),
                    width=W,
                    height=H,
                    image=rng.random((3, H, W), dtype=np.float32),
                    segmentation=np.zeros((3, H, W), np.float32),
                )
            )
        views.append(step_views)
    return views


@pytest.mark.slow
def test_stage2_train_distributed_matches_single_device():
    """stage2.train(mesh_cameras=8) must follow the single-device trajectory
    (same picks, same losses up to cross-device f32 summation order)."""
    from splatpu.train.stage2 import train

    rng = np.random.default_rng(0)
    cloud = make_random_cloud(jax.random.key(2), 48)
    views = _tiny_views(n_cams=6, n_timesteps=2, rng=rng)
    base = dict(
        total_iterations=2,
        warmup_iterations=1,
        hidden_dim=32,
        residual_blocks=1,
        views_per_step=5,
        timestep_count=2,
        renderer="stream",
        binning=BIN,
        seed=3,
    )
    params_single, *_ = train(cloud, views, Stage2Config(**base))
    params_dist, *_ = train(
        cloud, views, Stage2Config(**base, mesh_cameras=len(jax.devices()))
    )
    for a, b in zip(jax.tree.leaves(params_single), jax.tree.leaves(params_dist)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_stage1_fit_distributed_matches_single_device():
    """stage1.fit(mesh_tiles=8) (strip-sharded dual render) must match the
    single-device fit trajectory."""
    from splatpu.train.stage1 import Stage1Config, fit

    rng = np.random.default_rng(1)
    n = 40
    pts = np.concatenate(
        [
            rng.normal(size=(n, 3)).astype(np.float32) * 0.5,
            rng.random((n, 3), dtype=np.float32),
            (rng.random((n, 1)) > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    views = _tiny_views(n_cams=2, n_timesteps=1, rng=rng)[0]
    base = dict(iterations=4, capacity_factor=1.5, renderer="stream", binning=BIN)
    cloud_single, _ = fit(pts, views, 2.0, Stage1Config(**base))
    cloud_dist, _ = fit(
        pts, views, 2.0, Stage1Config(**base, mesh_tiles=len(jax.devices()))
    )
    np.testing.assert_allclose(
        np.asarray(cloud_single.means), np.asarray(cloud_dist.means),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(cloud_single.opacity_logits),
        np.asarray(cloud_dist.opacity_logits),
        rtol=1e-4, atol=1e-6,
    )
