"""Checkpointing and artifact export.

The reference only exports terminal artifacts — the densified cloud `.pth`
(`densify.py:190-198`) and the deformation-network bundle
(state_dict + config + cloud copy, `train.py:647-679`) — with no mid-run
resume (SURVEY.md §5.3/§5.4).  Here:

- `save_cloud` / `load_cloud`: the stage-1 -> stage-2 hand-off artifact
  (npz; structure-of-arrays + alive mask);
- `save_checkpoint` / `load_checkpoint`: full mid-run state (arbitrary pytree:
  params, optimizer state, RNG key, loop counters) via flax serialization —
  crash recovery simply restarts from the latest checkpoint;
- `export_deformation_bundle`: the deployable inference artifact mirroring
  `train.py:647-679` (network params + net config json + initial cloud).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization

from splatpu.core.types import GaussianCloud

CLOUD_KEYS = (
    "means",
    "colors",
    "segmentation_masks",
    "rotation_quaternions",
    "opacity_logits",
    "log_scales",
    "alive",
)


def compact_cloud(cloud: GaussianCloud, round_to: int = 256) -> GaussianCloud:
    """Pack live Gaussians to the front and shrink capacity to the smallest
    `round_to` multiple that holds them.

    The reference's exported artifact holds ONLY live Gaussians
    (`densify.py:190-198` saves the dense parameter dict); our fixed-capacity
    dead slots are a training-time implementation detail.  Compacting at
    export also right-sizes every capacity-scaled budget downstream (stage-2
    binning, kNN, deformation batch) — a 240k-capacity cloud with 40k alive
    would otherwise pay 6x in stage 2."""
    import jax.numpy as jnp

    alive = np.asarray(cloud.alive)
    idx = np.nonzero(alive)[0]
    n = max(len(idx), 1)
    # Never grow a cloud smaller than one rounding unit.
    cap = min(-(-n // round_to) * round_to, cloud.capacity)

    def take(a):
        a = np.asarray(a)
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[: len(idx)] = a[idx]
        return jnp.asarray(out)

    new_alive = np.zeros((cap,), bool)
    new_alive[: len(idx)] = True
    return GaussianCloud(
        alive=jnp.asarray(new_alive),
        **{k: take(getattr(cloud, k)) for k in CLOUD_KEYS if k != "alive"},
    )


def save_cloud(path: Path, cloud: GaussianCloud, compact: bool = True):
    if compact:
        cloud = compact_cloud(cloud)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, **{k: np.asarray(getattr(cloud, k)) for k in CLOUD_KEYS}
    )


def load_cloud(path: Path) -> GaussianCloud:
    import jax.numpy as jnp

    data = np.load(Path(path))
    return GaussianCloud(**{k: jnp.asarray(data[k]) for k in CLOUD_KEYS})


def save_checkpoint(path: Path, state_pytree, backend: str = "auto"):
    """Serialize an arbitrary pytree; atomic.

    backend:
    - "msgpack": single-file flax serialization (host-local; simple, portable).
    - "orbax":   orbax-checkpoint directory (async-capable, multi-host-aware
                 sharded saves — the right backend for multi-chip runs where
                 each process writes its own shards).
    - "auto":    orbax when the path looks like a directory request (exists as
                 a dir or has no suffix and orbax is importable), else msgpack.
    """
    path = Path(path)
    backend = _resolve_backend(path, backend)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            # Orbax requires a fresh absolute directory; it writes atomically
            # via its own tmp-dir + rename protocol.
            ckptr.save(path.resolve(), state_pytree, force=True)
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = serialization.to_bytes(state_pytree)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    tmp.replace(path)


def load_checkpoint(path: Path, target_pytree, backend: str = "auto"):
    """Restore into the structure of `target_pytree` (shapes must match)."""
    path = Path(path)
    backend = _resolve_backend(path, backend)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:

            def abstract_leaf(x):
                if not hasattr(x, "dtype"):
                    return x
                # Preserve the target's sharding so orbax restores each
                # process's shards in place (multi-host/sharded arrays
                # restore without the "sharding info not provided" fallback).
                sharding = getattr(x, "sharding", None)
                return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

            abstract = jax.tree.map(abstract_leaf, target_pytree)
            return ckptr.restore(path.resolve(), abstract)
    payload = path.read_bytes()
    return serialization.from_bytes(target_pytree, payload)


def _resolve_backend(path: Path, backend: str) -> str:
    if backend != "auto":
        return backend
    if path.is_dir():
        return "orbax"
    if path.suffix:
        return "msgpack"
    try:
        import orbax.checkpoint  # noqa: F401

        return "orbax"
    except Exception:
        return "msgpack"


def export_deformation_bundle(
    directory: Path,
    net_params,
    net_config_dict: dict,
    cloud: GaussianCloud,
):
    """`train.py:647-679` equivalent: a self-contained inference bundle."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    save_cloud(directory / "densified_initial_gaussian_cloud_parameters.npz", cloud)
    with (directory / "config.json").open("w") as f:
        json.dump(net_config_dict, f, indent="\t")
    (directory / "network_params.msgpack").write_bytes(
        serialization.to_bytes(net_params)
    )


def load_deformation_bundle(directory: Path, net_params_template):
    directory = Path(directory)
    cloud = load_cloud(directory / "densified_initial_gaussian_cloud_parameters.npz")
    with (directory / "config.json").open() as f:
        config = json.load(f)
    net_params = serialization.from_bytes(
        net_params_template, (directory / "network_params.msgpack").read_bytes()
    )
    return cloud, config, net_params
