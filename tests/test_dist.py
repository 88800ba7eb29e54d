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
    l1_s, ssim_s = jax.jit(sharded)(args, w2c, K, target, weights)

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
    l1_s, _ = jax.jit(sharded)(args, w2c, K, images, weights)
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
    w2c, K, images, weights = pad_views(w2c, K, images, n_dev)
    enc_prev, prev_fg = snapshot_previous(dense_cloud, fg_idx, neighbor_info)

    new_params, opt_state, enc_prev, prev_fg, aux = step(
        net_params, opt_state, enc_prev, prev_fg,
        jnp.float32(1.0), w2c, K, images, weights,
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
