"""Render a trained deformation bundle to free-viewpoint video.

The reference couples inference to the end of training (`train.py:778-793`);
this standalone entry point consumes the exported bundle
(`deformation_network/` with cloud + config + network params) so rendering can
run anywhere without retraining.

Usage:
    python -m splatpu.cli.render <bundle_dir> [-o OUT_DIR] [-fps N]
        [--timesteps N] [--renderer auto|stream|pallas]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="splatpu-render")
    p.add_argument("bundle_dir", type=Path)
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("-fps", type=int, default=30)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--renderer", default="auto")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    args = p.parse_args(argv)

    import jax

    from splatpu.dynamics.deform import normalize_and_encode_means_and_rotations
    from splatpu.dynamics.network import DeformationNetConfig, init_deformation_net
    from splatpu.io.checkpoint import load_deformation_bundle
    from splatpu.train.inference import run_inference
    from splatpu.train.stage2 import Stage2Config, compact_cloud

    # Build a parameter template from the bundle's config, then restore.
    import json

    with (args.bundle_dir / "config.json").open() as f:
        bundle_cfg = json.load(f)
    net_cfg = DeformationNetConfig(
        hidden_dim=bundle_cfg["hidden_dimension"],
        residual_blocks=bundle_cfg["residual_block_count"],
    )
    template = init_deformation_net(jax.random.key(0), net_cfg)
    cloud, _, net_params = load_deformation_bundle(args.bundle_dir, template)
    cloud = compact_cloud(cloud)

    t_count = args.timesteps or bundle_cfg["timestep_count"]
    config = Stage2Config(
        hidden_dim=bundle_cfg["hidden_dimension"],
        residual_blocks=bundle_cfg["residual_block_count"],
        timestep_count=t_count,
        renderer=args.renderer,
    )
    encoded_initial = normalize_and_encode_means_and_rotations(
        cloud.means, cloud.rotation_quaternions
    )
    out_dir = args.output or (args.bundle_dir / "renders")
    run_inference(
        net_params,
        cloud,
        encoded_initial,
        config,
        output_directory=out_dir,
        fps=args.fps,
        width=args.width,
        height=args.height,
    )
    print(f"renders -> {out_dir}")


if __name__ == "__main__":
    main()
