"""Metrics sinks: JSONL always, wandb when available and enabled.

The reference logs to wandb exclusively and synchronously — each `.item()`
call forces a device->host sync inside the hot loop (`densify.py:229-236`,
`train.py:419-428`).  Here metrics are device arrays collected into a small
buffer and flushed asynchronously: callers hand over jax arrays, conversion to
Python floats happens at flush time (after the step's dispatch), not at call
time.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional


class MetricsLogger:
    def __init__(
        self,
        jsonl_path: Optional[Path] = None,
        use_wandb: bool = False,
        wandb_project: Optional[str] = None,
        flush_every: int = 50,
    ):
        self._path = Path(jsonl_path) if jsonl_path else None
        self._file = None
        self._buffer: list[tuple[int, dict[str, Any]]] = []
        self._flush_every = flush_every
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                wandb.init(project=wandb_project or "splatpu")
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: dict[str, Any], step: int):
        """Accepts python scalars or jax arrays; arrays are kept as-is (no
        sync) until flush."""
        self._buffer.append((step, dict(metrics)))
        if len(self._buffer) >= self._flush_every:
            self.flush()

    def flush(self):
        if not self._buffer:
            return
        if self._path and self._file is None:
            self._path.parent.mkdir(parents=True, exist_ok=True)
            self._file = self._path.open("a")
        # ONE batched device_get for every buffered array: individual
        # float(v) fetches cost ~10-20 ms EACH through the TPU tunnel
        # (measured: 100 float() = 2196 ms vs one device_get of the same
        # 100 = 0.9 ms), which at ~10 metrics x 50 buffered steps added
        # >200 ms of fetch overhead per training step.
        import jax

        arrays = [
            v
            for _, metrics in self._buffer
            for v in metrics.values()
            if hasattr(v, "dtype")
        ]
        fetched = iter(jax.device_get(arrays))
        for step, metrics in self._buffer:
            concrete = {
                k: (
                    float(next(fetched))
                    if hasattr(v, "dtype")
                    else (float(v) if isinstance(v, (int, float)) else v)
                )
                for k, v in metrics.items()
            }
            if self._file:
                self._file.write(
                    json.dumps({"step": step, "ts": time.time(), **concrete}) + "\n"
                )
            if self._wandb:
                self._wandb.log(concrete, step=step)
        self._buffer.clear()
        if self._file:
            self._file.flush()

    def log_video(self, name: str, frames, fps: int = 30, step: Optional[int] = None):
        """wandb.Video logging (`train.py:630-636`); no-op without wandb.

        `frames` is a list/array of (H, W, 3) uint8 frames."""
        if self._wandb is None:
            return
        import numpy as np

        # wandb.Video wants (T, C, H, W).
        arr = np.transpose(np.stack(frames), (0, 3, 1, 2))
        self._wandb.log(
            {name: self._wandb.Video(arr, fps=fps, format="mp4")}, step=step
        )

    def save_run_files(self, run_dir):
        """Mirror every file under `run_dir` to the wandb run
        (`export_files_to_wandb`, reference `train.py:681-684`); no-op
        without wandb."""
        if self._wandb is None:
            return
        run_dir = Path(run_dir)
        for f in sorted(run_dir.rglob("*")):
            if f.is_file():
                self._wandb.save(str(f), base_path=str(run_dir), policy="now")

    def close(self):
        self.flush()
        if self._file:
            self._file.close()
            self._file = None
