"""Checkpoint/export round-trips and the synthetic-sequence data loader."""

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.data.dataset import (
    get_scene_radius,
    load_initial_point_cloud,
    load_metadata,
    load_timestep_views,
    save_synthetic_sequence,
)
from splatpu.data.synthetic import make_random_cloud
from splatpu.io.checkpoint import (
    export_deformation_bundle,
    load_checkpoint,
    load_cloud,
    load_deformation_bundle,
    save_checkpoint,
    save_cloud,
)


def test_cloud_roundtrip(tmp_path):
    cloud = make_random_cloud(jax.random.key(0), 20, capacity=32)
    save_cloud(tmp_path / "c.npz", cloud)
    back = load_cloud(tmp_path / "c.npz")
    # Live rows round-trip exactly; dead-slot values are not part of the
    # artifact contract (save_cloud compacts, zeroing dead padding).
    np.testing.assert_array_equal(np.asarray(back.alive), np.asarray(cloud.alive))
    for k in ("means", "colors", "opacity_logits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, k))[:20], np.asarray(getattr(cloud, k))[:20]
        )


def test_save_cloud_compacts_dead_slots(tmp_path):
    """Exported artifacts hold only live Gaussians (reference
    `densify.py:190-198` saves the dense dict); capacity shrinks to the
    smallest 256-multiple and live rows pack to the front."""
    from splatpu.io.checkpoint import compact_cloud

    cloud = make_random_cloud(jax.random.key(1), 300, capacity=1024)
    alive = np.zeros((1024,), bool)
    keep = np.random.default_rng(0).choice(300, size=100, replace=False)
    alive[keep] = True
    cloud = cloud.replace(alive=jnp.asarray(alive))

    save_cloud(tmp_path / "c.npz", cloud)
    back = load_cloud(tmp_path / "c.npz")
    assert back.capacity == 256
    assert int(back.n_alive()) == 100
    np.testing.assert_array_equal(np.asarray(back.alive)[:100], True)
    np.testing.assert_allclose(
        np.sort(np.asarray(back.means)[:100], axis=0),
        np.sort(np.asarray(cloud.means)[np.sort(keep)], axis=0),
    )
    # Identity on an already-compact cloud.
    same = compact_cloud(back)
    assert same.capacity == back.capacity
    np.testing.assert_array_equal(np.asarray(same.means), np.asarray(back.means))


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.int32(17),
        "nested": [jnp.ones((4,)), {"x": jnp.zeros((2, 2))}],
    }
    save_checkpoint(tmp_path / "ckpt.msgpack", state)
    zero = jax.tree.map(jnp.zeros_like, state)
    back = load_checkpoint(tmp_path / "ckpt.msgpack", zero)
    assert int(back["step"]) == 17
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]), np.asarray(state["params"]["w"]))


def test_checkpoint_roundtrip_orbax(tmp_path):
    import pytest

    pytest.importorskip("orbax.checkpoint")
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.int32(17),
        "nested": [jnp.ones((4,)), {"x": jnp.zeros((2, 2))}],
    }
    save_checkpoint(tmp_path / "ckpt_dir", state, backend="orbax")
    zero = jax.tree.map(jnp.zeros_like, state)
    back = load_checkpoint(tmp_path / "ckpt_dir", zero, backend="orbax")
    assert int(back["step"]) == 17
    np.testing.assert_array_equal(
        np.asarray(back["params"]["w"]), np.asarray(state["params"]["w"])
    )
    # "auto" resolves an existing orbax directory back to the orbax backend.
    auto = load_checkpoint(tmp_path / "ckpt_dir", zero)
    np.testing.assert_array_equal(
        np.asarray(auto["nested"][0]), np.asarray(state["nested"][0])
    )


def test_deformation_bundle_roundtrip(tmp_path):
    from splatpu.dynamics.network import DeformationNetConfig, init_deformation_net

    cfg = DeformationNetConfig(hidden_dim=16, residual_blocks=1)
    params = init_deformation_net(jax.random.key(1), cfg)
    cloud = make_random_cloud(jax.random.key(2), 10)
    export_deformation_bundle(
        tmp_path / "bundle", params, {"hidden_dimension": 16}, cloud
    )
    template = jax.tree.map(jnp.zeros_like, params)
    cloud2, config, params2 = load_deformation_bundle(tmp_path / "bundle", template)
    assert config["hidden_dimension"] == 16
    np.testing.assert_allclose(
        np.asarray(params2["fc_in"]["w"]), np.asarray(params["fc_in"]["w"])
    )
    np.testing.assert_allclose(np.asarray(cloud2.means), np.asarray(cloud.means))


def test_synthetic_sequence_loader_roundtrip(tmp_path):
    t, c, h, w = 2, 3, 24, 32
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(t, c, 3, h, w)).astype(np.float32)
    segs = (rng.uniform(size=(t, c, h, w)) > 0.5).astype(np.float32)
    K = np.tile(np.eye(3, dtype=np.float32) * 20, (t, c, 1, 1))
    K[..., 2, 2] = 1
    w2c = np.tile(np.eye(4, dtype=np.float32), (t, c, 1, 1))
    w2c[..., 2, 3] = 4.0
    # Distinct camera positions so the scene radius is nonzero.
    w2c[..., 0, 3] = np.arange(c, dtype=np.float32)[None, :]
    pc = rng.uniform(size=(50, 7)).astype(np.float32)
    save_synthetic_sequence(tmp_path / "seq", images, segs, K, w2c, pc)

    meta = load_metadata(tmp_path / "seq")
    assert meta.timestep_count == t - 1
    assert meta.camera_count == c
    assert meta.width == w and meta.height == h
    views = load_timestep_views(meta, 0, tmp_path / "seq")
    assert len(views) == c
    assert views[0].image.shape == (3, h, w)
    # JPEG is lossy; just sanity-check correlation.
    assert abs(views[0].image.mean() - images[0, 0].mean()) < 0.05
    seg3 = views[1].segmentation
    np.testing.assert_array_equal(seg3[1], 0.0)
    np.testing.assert_allclose(seg3[0] + seg3[2], 1.0)

    loaded_pc = load_initial_point_cloud(tmp_path / "seq")
    np.testing.assert_allclose(loaded_pc, pc)
    assert get_scene_radius(meta) > 0
