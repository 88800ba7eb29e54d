"""CMU-Panoptic / Dynamic-3D-Gaussians data-layout loader.

On-disk format (SURVEY.md §1 data layer; reference `shared.py:127-171`,
`densify.py:22-65`, `train.py:130-135,207-217`):

- ``train_meta.json``: {"fn": [T][C] filenames, "w": int, "h": int,
  "k": [T][C][3][3] intrinsics, "w2c": [T][C][4][4] extrinsics}
- ``init_pt_cld.npz``: array "data" of shape (N, 7) = xyz | rgb | seg
- ``ims/<cam>/<frame>.jpg`` images, ``seg/<cam>/<frame>.png`` binary masks

The loader returns host-side numpy; staging to device (and sharding across
hosts) happens in the trainers.  Unlike the reference — which eagerly pushes
every (timestep, camera) image to the GPU (`train.py:207-217`) — views are
loaded lazily per timestep with an optional preload.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class ViewData:
    """One (timestep, camera) observation, host-side."""

    camera_index: int
    w2c: np.ndarray        # (4, 4)
    K: np.ndarray          # (3, 3)
    width: int
    height: int
    image: np.ndarray      # (3, H, W) float32 in [0, 1]
    segmentation: np.ndarray  # (3, H, W) float32 channels (fg, 0, bg)


@dataclasses.dataclass
class SequenceMetadata:
    width: int
    height: int
    filenames: list[list[str]]       # [T][Ct] — Ct may vary per timestep
    intrinsics: list[np.ndarray]     # [T] of (Ct, 3, 3)
    extrinsics: list[np.ndarray]     # [T] of (Ct, 4, 4)

    @property
    def timestep_count(self) -> int:
        """Trainable timesteps = frames - 1 (`train.py:130-135`)."""
        return len(self.filenames) - 1

    @property
    def camera_count(self) -> int:
        return len(self.filenames[0])


def load_metadata(sequence_path: Path) -> SequenceMetadata:
    """Per-timestep arrays, NOT one (T, C, ...) block: real CMU-Panoptic
    captures drop frames, so per-timestep camera counts may differ — the
    reference indexes the raw nested lists per timestep
    (`shared.py:129-151`) and never materializes a rectangular array.  A
    single np.asarray over the ragged lists would raise on such sequences.
    """
    with (Path(sequence_path) / "train_meta.json").open() as f:
        meta = json.load(f)
    return SequenceMetadata(
        width=int(meta["w"]),
        height=int(meta["h"]),
        filenames=meta["fn"],
        intrinsics=[np.asarray(k, np.float32) for k in meta["k"]],
        extrinsics=[np.asarray(w, np.float32) for w in meta["w2c"]],
    )


def load_initial_point_cloud(sequence_path: Path) -> np.ndarray:
    """(N, 7) xyz|rgb|seg (`densify.py:23`)."""
    return np.load(Path(sequence_path) / "init_pt_cld.npz")["data"].astype(np.float32)


def get_scene_radius(metadata: SequenceMetadata) -> float:
    """1.1 * max distance of a timestep-0 camera center from their mean
    (`densify.py:60-65`)."""
    centers = np.linalg.inv(metadata.extrinsics[0])[:, :3, 3]
    return float(
        1.1 * np.max(np.linalg.norm(centers - centers.mean(0, keepdims=True), axis=-1))
    )


def load_timestep_views(
    metadata: SequenceMetadata, timestep: int, sequence_path: Path,
    camera_indices: list[int] | None = None,
) -> list[ViewData]:
    """`shared.py:127-171`: image -> float CHW / 255; binary seg mask ->
    3 channels (fg, 0, bg).

    `camera_indices` restricts loading to a subset of cameras (per-process
    data loading on multi-host runs, `splatpu.dist.process`); ViewData keeps
    the global camera index either way."""
    from PIL import Image

    sequence_path = Path(sequence_path)
    views = []
    selected = (
        list(enumerate(metadata.filenames[timestep]))
        if camera_indices is None
        else [(c, metadata.filenames[timestep][c]) for c in camera_indices]
    )
    for camera_index, filename in selected:
        img = np.asarray(
            Image.open(sequence_path / "ims" / filename), dtype=np.float32
        )
        img = np.transpose(img, (2, 0, 1)) / 255.0
        seg = np.asarray(
            Image.open(
                sequence_path / "seg" / filename.replace(".jpg", ".png")
            ),
            dtype=np.float32,
        )
        seg3 = np.stack([seg, np.zeros_like(seg), 1.0 - seg])
        views.append(
            ViewData(
                camera_index=camera_index,
                w2c=metadata.extrinsics[timestep][camera_index],
                K=metadata.intrinsics[timestep][camera_index],
                width=metadata.width,
                height=metadata.height,
                image=img,
                segmentation=seg3,
            )
        )
    return views


def save_synthetic_sequence(
    path: Path,
    images: np.ndarray,        # (T, C, 3, H, W) in [0, 1]
    segmentations: np.ndarray,  # (T, C, H, W) binary
    intrinsics: np.ndarray,    # (T, C, 3, 3)
    extrinsics: np.ndarray,    # (T, C, 4, 4)
    point_cloud: np.ndarray,   # (N, 7)
):
    """Write a sequence in the on-disk layout (for tests / demos)."""
    from PIL import Image

    path = Path(path)
    t_count, c_count = images.shape[:2]
    fn = [
        [f"{c}/{t:06d}.jpg" for c in range(c_count)] for t in range(t_count)
    ]
    (path).mkdir(parents=True, exist_ok=True)
    for t in range(t_count):
        for c in range(c_count):
            img_path = path / "ims" / f"{c}"
            seg_path = path / "seg" / f"{c}"
            img_path.mkdir(parents=True, exist_ok=True)
            seg_path.mkdir(parents=True, exist_ok=True)
            arr = (np.clip(images[t, c], 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
            Image.fromarray(arr).save(img_path / f"{t:06d}.jpg", quality=95)
            Image.fromarray(
                segmentations[t, c].astype(np.uint8)
            ).save(seg_path / f"{t:06d}.png")
    meta = {
        "w": int(images.shape[-1]),
        "h": int(images.shape[-2]),
        "fn": fn,
        "k": np.asarray(intrinsics).tolist(),
        "w2c": np.asarray(extrinsics).tolist(),
    }
    with (path / "train_meta.json").open("w") as f:
        json.dump(meta, f)
    np.savez(path / "init_pt_cld.npz", data=point_cloud.astype(np.float32))
