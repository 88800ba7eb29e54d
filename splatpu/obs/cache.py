"""Persistent XLA compilation cache setup.

Compiles of the full fwd+bwd render graph take minutes through the remote
TPU compile service; the on-disk cache makes repeat runs (benchmarks, CLIs
restarted after a crash) start in seconds.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = os.environ.get(
    "SPLATPU_COMPILE_CACHE", str(Path.home() / ".cache" / "splatpu_xla")
)


def enable_compilation_cache(directory: str | None = None):
    import jax

    d = directory or DEFAULT_DIR
    Path(d).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
