"""Child process for the real 2-process multi-sequence orchestration test.

Run as: python tests/_multiseq_child.py <coordinator_addr> <process_id> <out_dir>
Initializes jax.distributed for real (2 processes), builds the same 3 tiny
synthetic sequence jobs in BOTH processes, and runs
`splatpu.dist.multiseq.train_sequences` — each process must train only its
contiguous block (p0: jobs 0-1, p1: job 2) and write per-sequence artifacts.
Prints one line per trained sequence with the trained-parameter digest so the
parent can compare against independent single-process runs.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from splatpu.dist.mesh import initialize_multihost  # noqa: E402


def make_jobs():
    """3 tiny deterministic sequences (also built by the parent test)."""
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.dist.multiseq import SequenceJob
    from splatpu.render.api import render
    from splatpu.train.stage2 import Stage2Config

    class V:
        pass

    jobs = []
    for s in range(3):
        cloud = make_random_cloud(jax.random.key(100 + s), 48, extent=0.6)
        cams = [
            make_lookat_camera(
                eye=(1.5 * np.sin(a), 0.3, -1.5 * np.cos(a)),
                width=32, height=32, focal=32.0,
            )
            for a in (0.0, 2.1)
        ]

        def views(cloud=cloud, cams=cams):
            out = []
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
                out.append(vs)
            return out

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


def digest(tree):
    import numpy as np

    leaves = jax.tree_util.tree_leaves(tree)
    return float(sum(np.abs(np.asarray(l)).sum() for l in leaves))


def main():
    addr, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    initialize_multihost(
        coordinator_address=addr, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from splatpu.dist.multiseq import train_sequences

    jobs = make_jobs()
    results = train_sequences(jobs, out_dir=Path(out_dir) / f"p{pid}")
    expected = {0: ["seq0", "seq1"], 1: ["seq2"]}[pid]
    assert sorted(results) == expected, (pid, sorted(results))
    for name in sorted(results):
        print(f"TRAINED {pid} {name} {digest(results[name][0]):.6f}", flush=True)


if __name__ == "__main__":
    main()
