"""Multi-sequence batch orchestration (BASELINE config 5).

The reference trains ONE sequence per invocation on one GPU
(`/root/reference/train.py:809-847`); its config-5 workload ("3 Panoptic
scenes across >= 2 hosts, tiles+cameras sharded, grads psum'd",
BASELINE.json configs[4]) is a BATCH of independent sequence trainings
spread over the processes of a multi-host slice.

This layer adds what the reference has no counterpart for:

- **Assignment**: contiguous balanced blocks of sequences per process
  (`job_assignments`), mirroring `local_camera_indices`' layout logic so a
  slice's hosts each run a disjoint subset with zero cross-talk.
- **Invocation**: each assigned sequence trains through the standard
  `stage2.train` — the orchestration must be a pure router, so a sequence's
  result is bit-identical to an independent single-sequence run (tested:
  tests/test_multiseq.py).  Within one process a job may still shard its
  sampled cameras over local devices via `Stage2Config.mesh_cameras`.
- **Artifact routing**: per-sequence metrics/checkpoint/result files under
  `out_dir/<sequence>/`, so a batch run's evidence is indistinguishable
  from N independent runs'.

Data for sequences assigned to OTHER processes is never touched: jobs carry
zero-argument loader callables, resolved only for local jobs.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Optional, Union

import numpy as np

from splatpu.dist.process import ProcessTopology
from splatpu.train.stage2 import Stage2Config, train


@dataclasses.dataclass(frozen=True)
class SequenceJob:
    """One sequence's training inputs.

    ``initial_cloud`` / ``views_by_timestep`` may be the values themselves or
    zero-argument callables (preferred: a non-local job then costs no IO)."""

    name: str
    initial_cloud: Union[object, Callable[[], object]]
    views_by_timestep: Union[list, Callable[[], list]]
    config: Stage2Config

    def resolve_cloud(self):
        c = self.initial_cloud
        return c() if callable(c) else c

    def resolve_views(self):
        v = self.views_by_timestep
        return v() if callable(v) else v


def job_assignments(n_jobs: int, n_processes: int) -> list[list[int]]:
    """Balanced contiguous job blocks, one list per process.

    Contiguous (not round-robin) for the same reason as
    `local_camera_indices`: adjacent jobs land on adjacent hosts, and a
    debugging session maps process index -> sequence range trivially."""
    base = n_jobs // n_processes
    extra = n_jobs % n_processes
    out = []
    start = 0
    for p in range(n_processes):
        length = base + (1 if p < extra else 0)
        out.append(list(range(start, start + length)))
        start += length
    return out


def local_jobs(n_jobs: int, topo: Optional[ProcessTopology] = None) -> list[int]:
    topo = topo or ProcessTopology.current()
    return job_assignments(n_jobs, topo.count)[topo.index]


def train_sequences(
    jobs: list[SequenceJob],
    topo: Optional[ProcessTopology] = None,
    out_dir: Optional[Union[str, Path]] = None,
    progress: bool = False,
    resume: bool = False,
):
    """Train this process's assigned sequences; returns {name: (net_params,
    dense_cloud, encoded_initial, last_metrics)} for LOCAL jobs only.

    With ``out_dir`` set, each sequence writes `<out_dir>/<name>/`
    train_metrics.jsonl + stage2_ckpt.msgpack (when the job's config enables
    checkpointing and has no explicit path) + result.json; ``resume=True``
    restarts each local job from its own checkpoint when present."""
    from splatpu.obs.metrics import MetricsLogger

    topo = topo or ProcessTopology.current()
    names = [j.name for j in jobs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate sequence names: {names}")
    results = {}
    for ji in local_jobs(len(jobs), topo):
        job = jobs[ji]
        t0 = time.time()
        logger = None
        run_dir = None
        config = job.config
        resume_from = None
        if out_dir is not None:
            run_dir = Path(out_dir) / job.name
            run_dir.mkdir(parents=True, exist_ok=True)
            logger = MetricsLogger(jsonl_path=run_dir / "train_metrics.jsonl")
            if config.checkpoint_every and not config.checkpoint_path:
                config = dataclasses.replace(
                    config, checkpoint_path=str(run_dir / "stage2_ckpt.msgpack")
                )
            if resume and config.checkpoint_path and Path(config.checkpoint_path).exists():
                resume_from = config.checkpoint_path
        out = train(
            job.resolve_cloud(),
            job.resolve_views(),
            config,
            logger=logger,
            progress=progress,
            resume_from=resume_from,
        )
        results[job.name] = out
        if run_dir is not None:
            metrics = out[3]
            (run_dir / "result.json").write_text(
                json.dumps(
                    {
                        "sequence": job.name,
                        "process": topo.index,
                        "process_count": topo.count,
                        "sequence_iterations": config.total_iterations,
                        "timesteps": config.timestep_count,
                        "last_step": {
                            k: float(v)
                            for k, v in (metrics or {}).items()
                            if np.ndim(v) == 0
                        },
                        "wall_seconds": time.time() - t0,
                        "completed": True,
                    },
                    indent=2,
                )
            )
        if logger is not None:
            logger.close()
    return results
