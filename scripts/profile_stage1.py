"""Stage-1 step bisection: dual render / losses / stats / full step.

Usage: python scripts/profile_stage1.py [n] [w] [h]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from splatpu.core.types import GaussianCloud, activate_cloud
from splatpu.core.ssim import ssim
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.growth.densify import init_stats
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render_dual
from splatpu.train.stage1 import Stage1Config, make_step_fns
from splatpu.train.optim import make_stage1_adam


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.0, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = Stage1Config()
    image = jnp.full((3, h, w), 0.3)
    seg = jnp.zeros((3, h, w))

    def t(name, f, args_fn, iters=5):
        r = time_fn(jax.jit(f), args_fn=args_fn, iters=iters)
        print(f"{name}: {r['mean_ms']:.1f} ms", flush=True)

    jig = lambda i: (cloud.means + jnp.float32(i) * 1e-7,)

    # S1: dual render forward only
    def dual_fwd(means):
        c = cloud.replace(means=means)
        out, seg_out = render_dual(
            activate_cloud(c), c.segmentation_masks, cam, impl="pallas"
        )
        return jnp.mean(out.image) + jnp.mean(seg_out.image)

    t("S1 dual render fwd", dual_fwd, jig)

    # S2: dual render + L1-only losses fwd+bwd
    def dual_l1(means):
        c = cloud.replace(means=means)
        out, seg_out = render_dual(
            activate_cloud(c), c.segmentation_masks, cam, impl="pallas"
        )
        return jnp.mean(jnp.abs(out.image - image)) + 3.0 * jnp.mean(
            jnp.abs(seg_out.image - seg)
        )

    t("S2 dual+L1 fwd+bwd", lambda m: jnp.sum(jnp.abs(jax.grad(dual_l1)(m))), jig)

    # S3: + SSIM in both losses (the real stage-1 loss shape)
    def dual_full(means):
        c = cloud.replace(means=means)
        out, seg_out = render_dual(
            activate_cloud(c), c.segmentation_masks, cam, impl="pallas"
        )
        li = 0.8 * jnp.mean(jnp.abs(out.image - image)) + 0.2 * (
            1.0 - ssim(out.image, image)
        )
        ls = 0.8 * jnp.mean(jnp.abs(seg_out.image - seg)) + 0.2 * (
            1.0 - ssim(seg_out.image, seg)
        )
        return li + 3.0 * ls

    t("S3 dual+L1+SSIM fwd+bwd", lambda m: jnp.sum(jnp.abs(jax.grad(dual_full)(m))), jig)

    # S4: the real jitted train step
    train_step, mutate_step, adam = make_step_fns(cam, cfg, scene_radius=4.0)
    opt_state = adam.init(cloud.param_dict())
    stats = init_stats(cloud.capacity)

    def jig_step(i):
        return (
            cloud.replace(means=cloud.means + jnp.float32(i) * 1e-7),
            opt_state,
            stats,
            cam.w2c,
            cam.K,
            image,
            seg,
            jnp.bool_(True),
        )

    r = time_fn(train_step, args_fn=jig_step, iters=5)
    print(f"S4 REAL train_step: {r['mean_ms']:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
