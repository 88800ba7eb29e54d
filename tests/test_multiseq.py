"""Multi-sequence batch orchestration (BASELINE config 5; VERDICT r3
missing #3): assignment, routing purity (batch == N independent runs),
artifact layout, and the real 2-process jax.distributed path."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from splatpu.dist.multiseq import (
    SequenceJob,
    job_assignments,
    local_jobs,
    train_sequences,
)
from splatpu.dist.process import ProcessTopology
from splatpu.train.stage2 import Stage2Config, train


def test_assignments_balanced_contiguous():
    assert job_assignments(3, 2) == [[0, 1], [2]]
    assert job_assignments(5, 2) == [[0, 1, 2], [3, 4]]
    assert job_assignments(2, 4) == [[0], [1], [], []]
    assert job_assignments(8, 3) == [[0, 1, 2], [3, 4, 5], [6, 7]]
    # Every job appears exactly once.
    flat = [j for block in job_assignments(7, 3) for j in block]
    assert flat == list(range(7))


def test_local_jobs_uses_topology():
    assert local_jobs(3, ProcessTopology(count=2, index=0)) == [0, 1]
    assert local_jobs(3, ProcessTopology(count=2, index=1)) == [2]


def _tiny_jobs(n=3):
    """Deterministic tiny sequences (mirrors tests/_multiseq_child.py)."""
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import render

    class V:
        pass

    jobs = []
    for s in range(n):
        cloud = make_random_cloud(jax.random.key(100 + s), 48, extent=0.6)
        cams = [
            make_lookat_camera(
                eye=(1.5 * np.sin(a), 0.3, -1.5 * np.cos(a)),
                width=32, height=32, focal=32.0,
            )
            for a in (0.0, 2.1)
        ]
        views = []
        for t in range(2):
            vs = []
            shifted = cloud.replace(
                means=cloud.means + jnp.asarray([0.01 * t, 0.0, 0.0])
            )
            for i, c in enumerate(cams):
                img = render(activate_cloud(shifted), c, impl="stream").image
                v = V()
                v.camera_index = i
                v.w2c, v.K = np.asarray(c.w2c), np.asarray(c.K)
                v.width, v.height = 32, 32
                v.image = np.clip(np.asarray(img), 0.0, 1.0)
                vs.append(v)
            views.append(vs)
        jobs.append(
            SequenceJob(
                name=f"seq{s}",
                initial_cloud=cloud,
                views_by_timestep=views,
                config=Stage2Config(
                    total_iterations=2, warmup_iterations=1, hidden_dim=16,
                    residual_blocks=1, views_per_step=1, timestep_count=2,
                    renderer="stream", seed=s,
                ),
            )
        )
    return jobs


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_batch_matches_independent_runs(tmp_path):
    """The orchestration is a pure router: every sequence's trained params
    from a 2-fake-process batch equal an independent stage2.train run."""
    jobs = _tiny_jobs(3)

    independent = {
        j.name: train(j.resolve_cloud(), j.resolve_views(), j.config)
        for j in jobs
    }

    batch = {}
    for pid in range(2):
        batch.update(
            train_sequences(
                jobs,
                topo=ProcessTopology(count=2, index=pid),
                out_dir=tmp_path / f"p{pid}",
            )
        )
    assert sorted(batch) == ["seq0", "seq1", "seq2"]
    for name in batch:
        _assert_trees_equal(batch[name][0], independent[name][0])

    # Artifact layout: per-sequence metrics + result.json on the process
    # that owns the job.
    for pid, names in [(0, ["seq0", "seq1"]), (1, ["seq2"])]:
        for name in names:
            run = tmp_path / f"p{pid}" / name
            assert (run / "train_metrics.jsonl").exists()
            rec = json.loads((run / "result.json").read_text())
            assert rec["sequence"] == name
            assert rec["process"] == pid
            assert rec["completed"] is True
            assert "total" in rec["last_step"]


def test_duplicate_names_rejected():
    jobs = _tiny_jobs(2)
    dup = [jobs[0], jobs[0]]
    with pytest.raises(ValueError):
        train_sequences(dup, topo=ProcessTopology(count=1, index=0))


def test_nonlocal_jobs_never_resolved():
    """A job owned by another process must not have its loaders called."""
    jobs = _tiny_jobs(2)

    def boom():
        raise AssertionError("non-local job was resolved")

    jobs[1] = SequenceJob(
        name="seq1", initial_cloud=boom, views_by_timestep=boom,
        config=jobs[1].config,
    )
    out = train_sequences(jobs, topo=ProcessTopology(count=2, index=0))
    assert sorted(out) == ["seq0"]


def test_checkpoint_resume_per_sequence(tmp_path):
    """resume=True restarts a local sequence from its own checkpoint."""
    import dataclasses

    jobs = _tiny_jobs(1)
    cfg = dataclasses.replace(
        jobs[0].config, checkpoint_every=1, total_iterations=2
    )
    job = SequenceJob(
        name=jobs[0].name,
        initial_cloud=jobs[0].initial_cloud,
        views_by_timestep=jobs[0].views_by_timestep,
        config=cfg,
    )
    train_sequences([job], topo=ProcessTopology(), out_dir=tmp_path)
    ckpt = tmp_path / "seq0" / "stage2_ckpt.msgpack"
    assert ckpt.exists()
    # Resume: trains the remaining iterations (here: none beyond the ckpt,
    # so it must complete quickly and rewrite result.json).
    out = train_sequences(
        [job], topo=ProcessTopology(), out_dir=tmp_path, resume=True
    )
    assert "seq0" in out


@pytest.mark.slow
def test_two_process_distributed_batch(tmp_path):
    """REAL jax.distributed across 2 spawned CPU processes, each training its
    assigned block of the 3-sequence batch; trained-parameter digests must
    match independent in-process runs (same seeds, same CPU math)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    child = Path(__file__).parent / "_multiseq_child.py"
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), addr, str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(Path(__file__).parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"

    digests = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TRAINED "):
                _, pid, name, d = line.split()
                digests[name] = (int(pid), float(d))
    assert sorted(digests) == ["seq0", "seq1", "seq2"]
    assert digests["seq0"][0] == 0 and digests["seq1"][0] == 0
    assert digests["seq2"][0] == 1

    # Independent single-process references.
    jobs = _tiny_jobs(3)
    for j in jobs:
        params = train(j.resolve_cloud(), j.resolve_views(), j.config)[0]
        ref = float(
            sum(
                np.abs(np.asarray(l)).sum()
                for l in jax.tree_util.tree_leaves(params)
            )
        )
        assert abs(digests[j.name][1] - ref) < 1e-4 * max(1.0, abs(ref)), (
            j.name, digests[j.name][1], ref,
        )

    # Per-sequence artifacts landed under the owning process's directory.
    assert (tmp_path / "p0" / "seq0" / "result.json").exists()
    assert (tmp_path / "p1" / "seq2" / "result.json").exists()
