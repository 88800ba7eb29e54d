"""Stage-2 step bisection: deform / rigidity / renders / snapshot / full.

Usage: python scripts/profile_stage2.py [n] [w] [h] [views]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.train import stage2 as s2
from splatpu.core.ssim import ssim
from splatpu.dynamics.deform import update_cloud_parameters
from splatpu.dynamics.rigidity import rigidity_loss


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    v = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.0, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = s2.Stage2Config(
        total_iterations=10,
        warmup_iterations=1,
        hidden_dim=128,
        residual_blocks=3,
        views_per_step=v,
        timestep_count=10,
    )
    (
        dense_cloud, fg_idx, neighbor_info, enc_init,
        net_params, optimizer, opt_state2,
    ) = s2.setup(cloud, cfg)
    enc_prev, prev_fg = s2.snapshot_previous(dense_cloud, fg_idx, neighbor_info)
    net_cfg = cfg.net_config()
    images = jnp.zeros((v, 3, h, w))

    def jig_net(i):
        return (jax.tree.map(lambda x: x + jnp.float32(i) * 1e-9, net_params),)

    def t(name, f, args_fn, iters=3):
        r = time_fn(jax.jit(f), args_fn=args_fn, iters=iters)
        print(f"{name}: {r['mean_ms']:.1f} ms", flush=True)

    def deform(p):
        u = update_cloud_parameters(
            p, dense_cloud, enc_init, enc_prev, 1.0, cfg.timestep_count,
            net_cfg, cfg.quirk_compat,
        )
        return jnp.sum(u.means) + jnp.sum(u.rotation_quaternions)

    t("deform fwd", deform, jig_net)
    t("deform fwd+bwd", lambda p: jax.grad(
        lambda q: deform(q))(p)["fc_in"]["w"].ravel()[0], jig_net)

    def rig(p):
        u = update_cloud_parameters(
            p, dense_cloud, enc_init, enc_prev, 1.0, cfg.timestep_count,
            net_cfg, cfg.quirk_compat,
        )
        return rigidity_loss(
            u.means[fg_idx], u.rotation_quaternions[fg_idx],
            neighbor_info, prev_fg,
        )

    t("deform+rigidity fwd+bwd", lambda p: jax.grad(
        lambda q: rig(q))(p)["fc_in"]["w"].ravel()[0], jig_net)

    def renders(p):
        u = update_cloud_parameters(
            p, dense_cloud, enc_init, enc_prev, 1.0, cfg.timestep_count,
            net_cfg, cfg.quirk_compat,
        )
        args = activate_cloud(u)

        def one(img):
            out = render(args, cam, impl=cfg.renderer, config=cfg.binning)
            return jnp.mean(jnp.abs(out.image - img)) + (1.0 - ssim(out.image, img))

        return jnp.sum(jax.lax.map(one, images))

    t("deform+5renders fwd", renders, jig_net)
    t("deform+5renders fwd+bwd", lambda p: jax.grad(
        lambda q: renders(q))(p)["fc_in"]["w"].ravel()[0], jig_net)

    def snap(p):
        u = update_cloud_parameters(
            p, dense_cloud, enc_init, enc_prev, 1.0, cfg.timestep_count,
            net_cfg, cfg.quirk_compat,
        )
        e, f = s2.snapshot_previous(u, fg_idx, neighbor_info, cfg.quirk_compat)
        return jnp.sum(e) + jnp.sum(f.inverted_rotations)

    t("deform+snapshot", snap, jig_net)

    # Full loss (rigidity + 5 renders incl. SSIM) fwd+bwd — everything the
    # real step differentiates, no optimizer/snapshot.
    def full_loss(p):
        u = update_cloud_parameters(
            p, dense_cloud, enc_init, enc_prev, 1.0, cfg.timestep_count,
            net_cfg, cfg.quirk_compat,
        )
        rigl = rigidity_loss(
            u.means[fg_idx], u.rotation_quaternions[fg_idx],
            neighbor_info, prev_fg,
        )
        args = activate_cloud(u)

        def one(img):
            out = render(args, cam, impl=cfg.renderer, config=cfg.binning)
            return jnp.mean(jnp.abs(out.image - img)) + (1.0 - ssim(out.image, img))

        return jnp.sum(jax.lax.map(one, images)) + 3.0 * v * rigl

    t("full loss fwd+bwd", lambda p: jax.grad(full_loss)(p)["fc_in"]["w"].ravel()[0],
      jig_net)

    # The real jitted training step.
    step2 = s2.make_train_step(optimizer, cfg)
    all_w2c = jnp.tile(cam.w2c[None], (v, 1, 1))
    all_K = jnp.tile(cam.K[None], (v, 1, 1))
    pick = jnp.arange(v, dtype=jnp.int32)

    def real_step(p):
        out = step2(
            p, opt_state2, enc_prev, prev_fg, jnp.float32(1.0),
            all_w2c, all_K, images, pick, cam, dense_cloud, enc_init,
            fg_idx, neighbor_info,
        )
        return out[4]["total"]

    t("REAL make_train_step", real_step, jig_net)


if __name__ == "__main__":
    main()
