"""Training-step throughput at production scale (the real product metric).

Measures one full stage-1 step (dual render fwd+bwd + Adam) and one stage-2
step (deform + V renders + rigidity + Adam) on the current backend.

Usage: python scripts/profile_training.py [--gaussians 100000] [--size-w 1280]
    [--size-h 720] [--views 5]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=100_000)
    p.add_argument("--size-w", type=int, default=1280)
    p.add_argument("--size-h", type=int, default=720)
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--renderer", default="auto")
    p.add_argument("--view-batching", default="vmap")
    p.add_argument("--view-staging", default="device")
    p.add_argument("--compute-dtype", default="float32")
    p.add_argument("--skip-stage1", action="store_true")
    args = p.parse_args()

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import Camera
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.growth.densify import init_stats
    from splatpu.obs.profiling import time_fn
    from splatpu.train.stage1 import Stage1Config, make_step_fns
    from splatpu.train.optim import make_stage1_adam
    from splatpu.train import stage2 as s2

    n, w, h = args.gaussians, args.size_w, args.size_h
    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.0, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    image = jnp.zeros((3, h, w))
    seg = jnp.zeros((3, h, w))

    if args.skip_stage1:
        cfg1 = None
    if not args.skip_stage1:
        cfg1 = Stage1Config(renderer=args.renderer)
        train_step, mutate_step, adam = make_step_fns(cam, cfg1, scene_radius=4.0)
        opt_state = adam.init(cloud.param_dict())
        stats = init_stats(cloud.capacity)

        print(
            "stage1 step:",
            time_fn(
                train_step,
                args_fn=lambda i: (
                    cloud.replace(means=cloud.means + jnp.float32(i) * 1e-7),
                    opt_state,
                    stats,
                    cam.w2c,
                    cam.K,
                    image,
                    seg,
                    True,
                ),
                iters=5,
            ),
        )

    # Stage 2 at the same cloud scale.
    cfg2 = s2.Stage2Config(
        total_iterations=10,
        warmup_iterations=1,
        hidden_dim=128,
        residual_blocks=3,
        views_per_step=args.views,
        timestep_count=10,
        renderer=args.renderer,
        view_batching=args.view_batching,
        view_staging=args.view_staging,
        compute_dtype=args.compute_dtype,
    )
    (
        dense_cloud, fg_idx, neighbor_info, enc_init,
        net_params, optimizer, opt_state2,
    ) = s2.setup(cloud, cfg2)
    step2 = s2.make_train_step(optimizer, cfg2)
    all_w2c = jnp.tile(cam.w2c[None], (args.views, 1, 1))
    all_K = jnp.tile(cam.K[None], (args.views, 1, 1))
    if args.view_staging == "device_u8":
        all_images = jnp.zeros((args.views, 3, h, w), jnp.uint8)
    else:
        all_images = jnp.zeros((args.views, 3, h, w))
    pick = jnp.arange(args.views, dtype=jnp.int32)
    enc_prev, prev_fg = s2.snapshot_previous(dense_cloud, fg_idx, neighbor_info)

    print(
        "stage2 step:",
        time_fn(
            step2,
            args_fn=lambda i: (
                jax.tree.map(lambda x: x + jnp.float32(i) * 1e-9, net_params),
                opt_state2,
                enc_prev,
                prev_fg,
                jnp.float32(1.0),
                all_w2c,
                all_K,
                all_images,
                pick,
                cam,
                dense_cloud,
                enc_init,
                fg_idx,
                neighbor_info,
            ),
            iters=3,
        ),
    )


if __name__ == "__main__":
    main()
