"""Stage-2 CLI: train the deformation network and export visualizations.

Reference-compatible positionals (`train.py:809-847`):

    python -m splatpu.cli.train <sequence-name> <data-directory-path>
        <total-iteration-count> <warmup-iteration-count> <learning-rate>
        <hidden-dimension> <residual-block-count>
        [-t N] [-fps N] [-o PATH] [--renderer ...] [--wandb]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

from splatpu.cli.densify import add_binning_flags, binning_from_args
from splatpu.data.dataset import load_metadata, load_timestep_views
from splatpu.io.checkpoint import export_deformation_bundle, load_cloud
from splatpu.obs.metrics import MetricsLogger
from splatpu.train.inference import run_inference
from splatpu.train.stage2 import Stage2Config, train


def main(argv=None):
    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="splatpu-train")
    p.add_argument("sequence_name", type=str)
    p.add_argument("data_directory_path", type=Path)
    p.add_argument("total_iteration_count", type=int)
    p.add_argument("warmup_iteration_count", type=int)
    p.add_argument("learning_rate", type=float)
    p.add_argument("hidden_dimension", type=int)
    p.add_argument("residual_block_count", type=int)
    p.add_argument("-t", "--timestep-count-limit", type=int, default=None)
    p.add_argument("-fps", type=int, default=30)
    p.add_argument("-o", "--output-directory-path", type=Path, default=Path("./out"))
    p.add_argument("--renderer", default="auto")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--view-staging", default="device",
        choices=["device", "device_u8", "host"],
        help="where the (timestep, camera) view images live during training: "
             "device f32 (reference behavior), device uint8 (4x less HBM), "
             "or host RAM with per-step async staging (for sequences whose "
             "full view set exceeds device memory)",
    )
    p.add_argument("--compute-dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="deformation-MLP matmul dtype; auto = bfloat16 on TPU"
                        " (validated at quality parity), float32 elsewhere")
    p.add_argument(
        "--mesh-cameras", type=int, default=0,
        help="shard the sampled views over a `cameras` device mesh axis of"
             " this many devices (shard_map renders + psum'd network grads;"
             " 0 = single device)",
    )
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint every N sequence iterations (0 = off)")
    p.add_argument("--checkpoint-path", type=Path, default=None)
    p.add_argument("--resume-from", type=Path, default=None)
    add_binning_flags(p)
    args = p.parse_args(argv)

    sequence_path = args.data_directory_path / args.sequence_name
    metadata = load_metadata(sequence_path)
    t_count = metadata.timestep_count
    if args.timestep_count_limit is not None:
        t_count = min(t_count, args.timestep_count_limit)

    cloud = load_cloud(
        sequence_path / "densified_initial_gaussian_cloud_parameters.npz"
    )
    views_by_timestep = [
        load_timestep_views(metadata, t, sequence_path) for t in range(1, t_count + 1)
    ]

    config = Stage2Config(
        total_iterations=args.total_iteration_count,
        warmup_iterations=args.warmup_iteration_count,
        learning_rate=args.learning_rate,
        hidden_dim=args.hidden_dimension,
        residual_blocks=args.residual_block_count,
        timestep_count=t_count,
        renderer=args.renderer,
        binning_overrides=binning_from_args(args),
        seed=args.seed,
        view_staging=args.view_staging,
        compute_dtype=args.compute_dtype,
        mesh_cameras=args.mesh_cameras,
        checkpoint_every=args.checkpoint_every,
        checkpoint_path=(
            str(args.checkpoint_path) if args.checkpoint_path else None
        ),
    )
    run_dir = args.output_directory_path / args.sequence_name
    run_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(
        jsonl_path=run_dir / "train_metrics.jsonl",
        use_wandb=args.wandb,
        wandb_project="animating-gaussian-splats",
    )

    net_params, dense_cloud, encoded_initial, _ = train(
        cloud, views_by_timestep, config, logger=logger, progress=True,
        resume_from=(str(args.resume_from) if args.resume_from else None),
    )

    run_inference(
        net_params,
        dense_cloud,
        encoded_initial,
        config,
        output_directory=run_dir / "visualizations",
        views_by_timestep=views_by_timestep,
        fps=args.fps,
        logger=logger,
    )
    # Config + deployable bundle export (`train.py:639-679`).
    with (run_dir / "config.json").open("w") as f:
        json.dump(
            {
                **{k: str(v) if isinstance(v, Path) else v for k, v in vars(args).items()},
                "timestep_count": t_count,
            },
            f,
            indent="\t",
        )
    export_deformation_bundle(
        run_dir / "deformation_network",
        net_params,
        {
            "timestep_count": t_count,
            "residual_block_count": args.residual_block_count,
            "hidden_dimension": args.hidden_dimension,
        },
        dense_cloud,
    )
    # Mirror the run directory to wandb (`export_files_to_wandb`,
    # reference `train.py:681-684`); no-op without --wandb.
    logger.save_run_files(run_dir)
    logger.close()
    print(f"run artifacts -> {run_dir}")


if __name__ == "__main__":
    main()
