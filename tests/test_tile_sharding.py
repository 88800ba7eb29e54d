"""Tile-axis (image-strip) sharding must reproduce the single-device render."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.dist.tile_sharding import make_tile_sharded_render, strip_height
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig

BIN = BinningConfig(max_span=32, max_pairs=1 << 12, chunk_pairs=256)


def test_strip_render_matches_full_render():
    devices = np.asarray(jax.devices())
    n = devices.size
    mesh = Mesh(devices.reshape(1, n), axis_names=("cameras", "tiles"))

    cloud = make_random_cloud(jax.random.key(0), 64)
    cam = make_lookat_camera(eye=(0.2, -0.1, -4.0), width=64, height=64)
    args = activate_cloud(cloud)

    full = render(args, cam, impl="stream", config=BIN).image

    sharded = make_tile_sharded_render(mesh, cam, renderer="stream", binning=BIN)
    strips = jax.jit(sharded)(args, cam.w2c, cam.K)
    assert strips.shape[1] == strip_height(cam.height, n, BIN.tile) * n
    got = strips[:, : cam.height, :]

    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-5)


def test_strip_height_alignment():
    # Default tile matches render.api's product default (32px).
    assert strip_height(720, 8) % 32 == 0
    assert strip_height(720, 8) * 8 >= 720
    assert strip_height(64, 4) == 32
    # Explicit 16px tiles restore the legacy strip sizes.
    assert strip_height(720, 8, 16) % 16 == 0
    assert strip_height(64, 4, 16) == 16
