"""End-to-end quality check: does the full pipeline actually learn?

Builds a synthetic ground-truth scene, runs stage-1 densification and stage-2
animation training at a moderate scale, and reports PSNR of renders vs the
ground truth before and after each stage.

Usage: python scripts/quality_check.py [--gaussians 800] [--size 128]
    [--cameras 8] [--stage1-iters 1500] [--stage2-iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gaussians", type=int, default=800)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--cameras", type=int, default=8)
    p.add_argument("--stage1-iters", type=int, default=1500)
    p.add_argument("--stage2-iters", type=int, default=10)
    p.add_argument("--timesteps", type=int, default=3)
    p.add_argument("--renderer", default="auto")
    p.add_argument("--compute-dtype", default="float32")
    args = p.parse_args()

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.growth.densify import DensifyConfig
    from splatpu.obs.quality import psnr
    from splatpu.render.api import render
    from splatpu.train.stage1 import Stage1Config, fit
    from splatpu.train.stage2 import Stage2Config, train

    w = h = args.size
    truth = make_random_cloud(
        jax.random.key(0), args.gaussians, extent=0.8, scale_range=(0.02, 0.06)
    )
    cams = [
        make_lookat_camera(
            eye=(4.0 * np.sin(a), 0.5, -4.0 * np.cos(a)), width=w, height=h
        )
        for a in np.linspace(0, 2 * np.pi, args.cameras, endpoint=False)
    ]

    class View:
        pass

    render_jit = jax.jit(
        lambda a, c: render(a, c, impl=args.renderer).image
    )

    def views_for(cloud):
        out = []
        margs = activate_cloud(cloud)
        seg_args = margs.replace(colors=cloud.segmentation_masks)
        for cam in cams:
            v = View()
            v.w2c, v.K = np.asarray(cam.w2c), np.asarray(cam.K)
            v.width, v.height = w, h
            v.image = np.asarray(render_jit(margs, cam))
            v.segmentation = np.asarray(render_jit(seg_args, cam))
            out.append(v)
        return out

    t0 = time.time()
    views0 = views_for(truth)
    pc = np.concatenate(
        [
            np.asarray(truth.means),
            np.asarray(truth.colors),
            (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    # Degrade the init: subsample the point cloud so densification must work.
    keep = np.random.default_rng(0).choice(len(pc), size=len(pc) // 2, replace=False)
    pc = pc[keep]
    print(f"[{time.time()-t0:.0f}s] ground truth rendered; init points: {len(pc)}")

    cfg1 = Stage1Config(
        iterations=args.stage1_iters,
        capacity_factor=8.0,
        renderer=args.renderer,
        densify=DensifyConfig(
            window_end=args.stage1_iters // 2,
            mutate_start=200,
            mutate_every=100,
            opacity_reset_every=10**9,
        ),
    )
    cloud, metrics = fit(pc, views0, scene_radius=4.0, config=cfg1, progress=True)
    print(f"[{time.time()-t0:.0f}s] stage1 done; alive={int(cloud.n_alive())}")

    # PSNR of the fitted static cloud vs ground truth on a held-in view.
    fitted = np.asarray(render_jit(activate_cloud(cloud), cams[0]))
    print("stage1 PSNR(view0):", float(psnr(jnp.asarray(fitted), jnp.asarray(views0[0].image))))

    # Stage 2: ground-truth motion = global drift + slight rotation proxy.
    views_by_timestep = []
    for t in range(1, args.timesteps + 1):
        moved = truth.replace(means=truth.means + jnp.asarray([0.03 * t, 0.01 * t, 0.0]))
        views_by_timestep.append(views_for(moved))

    cfg2 = Stage2Config(
        total_iterations=args.stage2_iters,
        warmup_iterations=max(1, args.stage2_iters // 10),
        learning_rate=1e-3,
        hidden_dim=64,
        residual_blocks=2,
        views_per_step=min(5, args.cameras),
        timestep_count=args.timesteps,
        renderer=args.renderer,
        compute_dtype=args.compute_dtype,
    )
    history = []

    class Cap:
        def log(self, m, step):
            history.append({k: float(v) for k, v in m.items()})

        def flush(self):
            pass

    net_params, dense_cloud, enc_init, _ = train(
        cloud, views_by_timestep, cfg2, logger=Cap(), progress=True
    )
    first = np.mean([m["total"] for m in history[: args.timesteps]])
    last = np.mean([m["total"] for m in history[-args.timesteps :]])
    print(f"[{time.time()-t0:.0f}s] stage2 loss first->last: {first:.4f} -> {last:.4f}")

    # PSNR at final timestep vs ground truth.
    from splatpu.train.stage2 import rollout_step

    enc_prev = enc_init
    for t in range(1, args.timesteps + 1):
        rolled, enc_prev = jax.jit(
            lambda npar, c0, ei, ep, ts: rollout_step(npar, c0, ei, ep, ts, cfg2)
        )(net_params, dense_cloud, enc_init, enc_prev, jnp.float32(t))
    final = np.asarray(render_jit(activate_cloud(rolled), cams[0]))
    target = views_by_timestep[-1][0].image
    print(
        "stage2 PSNR(final timestep, view0):",
        float(psnr(jnp.asarray(final), jnp.asarray(target))),
    )


if __name__ == "__main__":
    main()
