"""Device meshes and multi-host initialization.

The reference is strictly single-process single-GPU (SURVEY.md §2, parallelism
row).  This layer is new, TPU-first:

- a named `jax.sharding.Mesh` with a ``cameras`` (data) axis and an optional
  ``tiles`` axis for intra-image sharding of very large renders;
- multi-host bring-up through `jax.distributed.initialize` (ICI within a
  slice, DCN across hosts — the mesh construction keeps hosts contiguous on
  the outer axis so collectives over ``cameras`` ride ICI whenever the axis
  fits inside a slice).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize JAX's distributed runtime if running multi-process.

    No-op for single-process runs (tests, single-host TPU, CPU).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_mesh(
    camera_axis: Optional[int] = None, tile_axis: int = 1, devices=None
) -> Mesh:
    """Build a (cameras, tiles) mesh over all devices.

    Device order from `jax.devices()` keeps hosts contiguous, so the
    fastest-varying (tiles) axis stays intra-host/ICI.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if camera_axis is None:
        camera_axis = n // tile_axis
    if camera_axis * tile_axis != n:
        raise ValueError(
            f"mesh {camera_axis}x{tile_axis} != {n} devices"
        )
    return Mesh(devices.reshape(camera_axis, tile_axis), axis_names=("cameras", "tiles"))
