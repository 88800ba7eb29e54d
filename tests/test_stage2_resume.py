"""Stage-2 mid-run checkpoint/resume."""

import pytest

import dataclasses

import jax
import numpy as np

from splatpu.data.synthetic import make_random_cloud
from splatpu.render.binning import BinningConfig
from splatpu.train.stage2 import Stage2Config, train
from tests.test_e2e import make_views, ring_cameras

BIN = BinningConfig(max_span=32, max_pairs=1 << 12, chunk_pairs=256)


@pytest.mark.slow
def test_stage2_checkpoint_and_resume(tmp_path):
    base_cloud = make_random_cloud(jax.random.key(1), 40, extent=0.7)
    cams = ring_cameras(4)
    views_by_timestep = [make_views(base_cloud, cams) for _ in range(2)]
    ckpt = tmp_path / "s2.msgpack"
    cfg = Stage2Config(
        total_iterations=2,
        warmup_iterations=1,
        hidden_dim=32,
        residual_blocks=1,
        views_per_step=3,
        timestep_count=2,
        renderer="stream",
        binning=BIN,
        checkpoint_every=1,
        checkpoint_path=str(ckpt),
    )
    net_a, *_ = train(base_cloud, views_by_timestep, cfg)
    assert ckpt.exists()

    more = dataclasses.replace(cfg, total_iterations=3)
    net_b, _, _, metrics = train(
        base_cloud, views_by_timestep, more, resume_from=ckpt
    )
    assert np.isfinite(float(metrics["total"]))
    # The resumed run continued training (params differ from the checkpoint).
    delta = sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree.leaves(net_a), jax.tree.leaves(net_b))
    )
    assert delta > 0
