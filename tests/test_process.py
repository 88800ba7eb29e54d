"""Multi-host story, testable single-host (SURVEY.md §4): process-count
abstraction, per-process view loading, multihost init wiring, and orbax
sharded checkpoint round-trip on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.dist.process import (
    ProcessTopology,
    load_local_timestep_views,
    local_camera_indices,
)


def test_local_camera_indices_partition_exactly():
    for n_cams in (1, 5, 8, 27):
        for count in (1, 2, 3, 8):
            blocks = [
                local_camera_indices(n_cams, ProcessTopology(count, i))
                for i in range(count)
            ]
            flat = [c for b in blocks for c in b]
            assert flat == list(range(n_cams))  # every camera exactly once
            sizes = [len(b) for b in blocks]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_topology_validation():
    with pytest.raises(ValueError):
        ProcessTopology(count=2, index=2)


def test_current_topology_single_process():
    topo = ProcessTopology.current()
    assert topo.count == jax.process_count() == 1
    assert topo.index == 0


def _write_tiny_sequence(path, n_cams=5, n_timesteps=2, hw=8):
    from splatpu.data.dataset import save_synthetic_sequence

    rng = np.random.default_rng(0)
    t = n_timesteps
    images = rng.random((t, n_cams, 3, hw, hw)).astype(np.float32)
    segs = (rng.random((t, n_cams, hw, hw)) > 0.5).astype(np.float32)
    K = np.tile(np.eye(3, dtype=np.float32) * hw, (t, n_cams, 1, 1))
    K[..., 2, 2] = 1.0
    w2c = np.tile(np.eye(4, dtype=np.float32), (t, n_cams, 1, 1))
    pts = rng.random((16, 7)).astype(np.float32)
    save_synthetic_sequence(path, images, segs, K, w2c, pts)


def test_per_process_view_loading(tmp_path):
    from splatpu.data.dataset import load_metadata, load_timestep_views

    _write_tiny_sequence(tmp_path, n_cams=5)
    meta = load_metadata(tmp_path)

    all_views = load_timestep_views(meta, 0, tmp_path)
    seen = []
    for i in range(2):  # fake 2-process topology on one host
        topo = ProcessTopology(count=2, index=i)
        local = load_local_timestep_views(meta, 0, tmp_path, topo)
        for v in local:
            seen.append(v.camera_index)
            # Global camera index preserved; content identical to a full load.
            np.testing.assert_array_equal(v.image, all_views[v.camera_index].image)
    assert sorted(seen) == list(range(5))


def test_initialize_multihost_wiring(monkeypatch):
    """Single-process call is a no-op; multi-process args reach
    jax.distributed.initialize verbatim."""
    from splatpu.dist.mesh import initialize_multihost

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    initialize_multihost()  # no-op
    initialize_multihost(num_processes=1)  # no-op
    assert calls == []
    initialize_multihost(
        coordinator_address="10.0.0.1:1234", num_processes=2, process_id=1
    )
    assert calls == [
        dict(
            coordinator_address="10.0.0.1:1234", num_processes=2, process_id=1
        )
    ]


def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded arrays must save/restore with their sharding preserved on the
    virtual 8-device mesh (multi-host checkpoint story, SURVEY.md §5.3)."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from splatpu.io.checkpoint import load_checkpoint, save_checkpoint

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, axis_names=("cameras",))
    sharding = NamedSharding(mesh, P("cameras"))
    x = jax.device_put(jnp.arange(32, dtype=jnp.float32).reshape(8, 4), sharding)
    state = {"x": x, "step": jnp.int32(7)}

    path = tmp_path / "ckpt"
    save_checkpoint(path, state, backend="orbax")
    restored = load_checkpoint(path, state, backend="orbax")
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.asarray(x))
    assert restored["x"].sharding == sharding
    assert int(restored["step"]) == 7


def test_two_process_distributed_psum():
    """REAL `jax.distributed.initialize` across 2 spawned CPU processes — the
    closest this single-host environment gets to a multi-host run (SURVEY.md
    §5.8).  Exercises initialize_multihost for real (coordinator handshake,
    process_count/process_index, cross-process pmap psum) instead of via
    monkeypatch."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    child = Path(__file__).parent / "_multihost_child.py"
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), addr, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process={i} psum=6.0" in out, out
