"""Process-count abstraction + per-process data sharding (SURVEY.md §4, §7).

Multi-host runs load data per process: each host reads only the camera views
its devices will consume (the reference eagerly loads every view on its single
GPU, `train.py:207-217`).  The topology is a plain value object so 1-process
tests cover the multi-process code path with a fake topology — real multi-host
just substitutes `ProcessTopology.current()` after `initialize_multihost`.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class ProcessTopology:
    """Which process am I, out of how many."""

    count: int = 1
    index: int = 0

    def __post_init__(self):
        if not (0 <= self.index < self.count):
            raise ValueError(f"process index {self.index} not in [0, {self.count})")

    @classmethod
    def current(cls) -> "ProcessTopology":
        return cls(count=jax.process_count(), index=jax.process_index())


def local_camera_indices(n_cameras: int, topo: ProcessTopology) -> list[int]:
    """Balanced contiguous camera block for this process.

    Contiguous blocks (not round-robin) keep each process's views adjacent to
    its devices' mesh coordinates: `get_mesh` lays hosts contiguously on the
    outer (cameras) axis, so a camera batch sharded over that axis lands on
    the process that loaded it without any resharding over DCN.
    """
    base = n_cameras // topo.count
    extra = n_cameras % topo.count
    start = topo.index * base + min(topo.index, extra)
    length = base + (1 if topo.index < extra else 0)
    return list(range(start, start + length))


def load_local_timestep_views(
    metadata, timestep: int, sequence_path, topo: ProcessTopology | None = None
):
    """Per-process `load_timestep_views`: reads only this process's cameras.

    Returns the local list[ViewData]; `ViewData.camera_index` keeps the GLOBAL
    camera index so view sampling can stay globally consistent across
    processes (each process keeps the picks that fall in its block).
    """
    from splatpu.data.dataset import load_timestep_views

    topo = topo or ProcessTopology.current()
    local = set(local_camera_indices(metadata.camera_count, topo))
    views = load_timestep_views(
        metadata, timestep, sequence_path, camera_indices=sorted(local)
    )
    return views
