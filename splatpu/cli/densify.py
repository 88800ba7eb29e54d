"""Stage-1 CLI: fit + densify a static Gaussian cloud for timestep 0.

Usage (reference-compatible positional arg, `densify.py:251-259`):

    python -m splatpu.cli.densify <sequence_path> [--iterations N]
        [--capacity-factor F] [--renderer auto|stream|pallas|oracle]
        [--output PATH] [--wandb] [--mesh-tiles N]
        [--max-pairs N] [--max-span N] [--span-small N] [--chunk-pairs N]
        [--grad-threshold F] [--checkpoint-every N] [--checkpoint-path P]
"""

from __future__ import annotations

import argparse
import dataclasses
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
from splatpu.render.binning import BinningConfig
from splatpu.train.stage1 import Stage1Config, fit


def add_binning_flags(p: argparse.ArgumentParser):
    """Shared binning-budget knobs (SURVEY.md §5.6: every hardcoded constant
    surfaced).  None = keep the product default heuristic."""
    g = p.add_argument_group("binning budgets")
    g.add_argument("--tile", type=int, default=None,
                   help="pixels per tile side (16 or 32)")
    g.add_argument("--max-pairs", type=int, default=None,
                   help="total (tile, gaussian) pair budget per render")
    g.add_argument("--max-span", type=int, default=None,
                   help="max tiles a single Gaussian may cover")
    g.add_argument("--span-small", type=int, default=None,
                   help="emission lanes for every Gaussian (two-class split)")
    g.add_argument("--chunk-pairs", type=int, default=None,
                   help="pair-stream chunk size (multiple of 128)")
    g.add_argument("--big-capacity", type=int, default=None,
                   help="static big-Gaussian emission slots")


def binning_from_args(args) -> dict | None:
    """Individual field overrides, applied by the trainers ON TOP of the
    n-scaled default heuristic (render.api.resolve_binning) — a single flag
    like --tile must not discard the budget heuristic for other fields."""
    overrides = {
        k: getattr(args, k)
        for k in (
            "tile", "max_pairs", "max_span", "span_small", "chunk_pairs",
            "big_capacity",
        )
        if getattr(args, k) is not None
    }
    return overrides or None


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
    p.add_argument(
        "--mesh-tiles", type=int, default=0,
        help="shard each render into N image strips over a `tiles` device"
             " mesh axis (0 = single device)",
    )
    p.add_argument(
        "--views-per-step", type=int, default=1,
        help="render N sampled cameras per iteration in one jitted step"
             " (vmap-batched dual renders; densification statistics advance"
             " as N reference iterations)",
    )
    p.add_argument("--grad-threshold", type=float, default=None,
                   help="densification screen-gradient threshold (default 2e-4)")
    p.add_argument("--no-grow-budget", action="store_true",
                   help="disable automatic pair-budget growth on binning overflow")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--checkpoint-path", type=Path, default=None)
    p.add_argument("--resume-from", type=Path, default=None)
    add_binning_flags(p)
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
    densify_cfg = DensifyConfig()
    if args.grad_threshold is not None:
        densify_cfg = dataclasses.replace(
            densify_cfg, grad_threshold=args.grad_threshold
        )
    config = Stage1Config(
        iterations=args.iterations,
        capacity_factor=args.capacity_factor,
        densify=densify_cfg,
        renderer=args.renderer,
        binning_overrides=binning_from_args(args),
        mesh_tiles=args.mesh_tiles,
        views_per_step=args.views_per_step,
        grow_budget_on_overflow=not args.no_grow_budget,
        seed=args.seed,
        checkpoint_every=args.checkpoint_every,
        checkpoint_path=(
            str(args.checkpoint_path) if args.checkpoint_path else None
        ),
    )
    cloud, metrics = fit(
        point_cloud, views, scene_radius, config, logger=logger, progress=True,
        resume_from=(str(args.resume_from) if args.resume_from else None),
    )
    out = args.output or (
        args.sequence_path / "densified_initial_gaussian_cloud_parameters.npz"
    )
    save_cloud(out, cloud)
    logger.close()
    print(f"saved densified cloud ({int(cloud.n_alive())} Gaussians) -> {out}")


if __name__ == "__main__":
    main()
