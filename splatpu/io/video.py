"""Frame and video export (`train.py:506-547,617-636` equivalents)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_uint8_frame(image_chw: np.ndarray) -> np.ndarray:
    """(3, H, W) float -> (H, W, 3) uint8, clipped (`train.py:534-545`)."""
    return (
        (255.0 * np.clip(np.asarray(image_chw), 0.0, 1.0))
        .astype(np.uint8)
        .transpose(1, 2, 0)
    )


def write_frame(path: Path, image_chw: np.ndarray) -> np.ndarray:
    import imageio

    frame = to_uint8_frame(image_chw)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(path, frame)
    return frame


def write_video(path: Path, frames: list[np.ndarray], fps: int = 30) -> Path:
    """Write an mp4; falls back to GIF (pillow backend, always available) when
    no ffmpeg backend exists in the environment. Returns the path written."""
    import imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        gif = path.with_suffix(".gif")
        imageio.mimwrite(gif, frames, duration=1000.0 / fps, loop=0)
        return gif
