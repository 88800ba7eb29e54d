"""Stage-1 CLI: fit + densify a static Gaussian cloud for timestep 0.

Usage (reference-compatible positional arg, `densify.py:251-259`):

    python -m splatpu.cli.densify <sequence_path> [--iterations N]
        [--capacity-factor F] [--renderer auto|stream|pallas|oracle]
        [--output PATH] [--wandb]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from splatpu.data.dataset import (
    get_scene_radius,
    load_initial_point_cloud,
    load_metadata,
    load_timestep_views,
)
from splatpu.growth.densify import DensifyConfig
from splatpu.io.checkpoint import save_cloud
from splatpu.obs.metrics import MetricsLogger
from splatpu.train.stage1 import Stage1Config, fit


def main(argv=None):
    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="splatpu-densify")
    p.add_argument("sequence_path", type=Path)
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--capacity-factor", type=float, default=4.0)
    p.add_argument("--renderer", default="auto")
    p.add_argument(
        "--output",
        type=Path,
        default=None,
        help="defaults to <sequence>/densified_initial_gaussian_cloud_parameters.npz",
    )
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    metadata = load_metadata(args.sequence_path)
    point_cloud = load_initial_point_cloud(args.sequence_path)
    scene_radius = get_scene_radius(metadata)
    views = load_timestep_views(metadata, 0, args.sequence_path)

    logger = MetricsLogger(
        jsonl_path=args.sequence_path / "densify_metrics.jsonl",
        use_wandb=args.wandb,
        wandb_project="densify-gaussian-cloud",
    )
    config = Stage1Config(
        iterations=args.iterations,
        capacity_factor=args.capacity_factor,
        renderer=args.renderer,
        seed=args.seed,
    )
    cloud, metrics = fit(
        point_cloud, views, scene_radius, config, logger=logger, progress=True
    )
    out = args.output or (
        args.sequence_path / "densified_initial_gaussian_cloud_parameters.npz"
    )
    save_cloud(out, cloud)
    logger.close()
    print(f"saved densified cloud ({int(cloud.n_alive())} Gaussians) -> {out}")


if __name__ == "__main__":
    main()
