"""Honest per-stage render profiling on the current backend.

Every stage gets distinct inputs per iteration (the axon tunnel memoizes
executions on identical inputs) and completion is observed via host fetches.

Usage: python scripts/profile_render.py [n_gaussians] [width] [height]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.core.types import activate_cloud
from splatpu.core.projection import preprocess
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig, build_pair_stream, tile_grid
from splatpu.render.pallas_composite import _composite


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = BinningConfig(max_span=64, max_pairs=1 << 21, chunk_pairs=256)
    args0 = activate_cloud(cloud)
    target = jnp.zeros((3, h, w))

    def jiggle(i):
        return (args0.replace(means3d=args0.means3d + jnp.float32(i) * 1e-7),)

    pp = jax.jit(preprocess)
    print("preprocess:", time_fn(lambda a: pp(a, cam), args_fn=jiggle, iters=5))

    binf = jax.jit(lambda a, c: build_pair_stream(a, c, cfg))
    print("binning:", time_fn(lambda a: binf(a, cam), args_fn=jiggle, iters=5))

    st = binf(args0, cam)
    from splatpu.render.pallas_composite import composite_stream

    bg = jnp.zeros((3,))
    comp = jax.jit(lambda s, m2: composite_stream(s, cam, cfg, bg, g_mean2d=m2).image)
    print(
        "composite fwd:",
        time_fn(
            comp,
            args_fn=lambda i: (st, st.splats.mean2d + jnp.float32(i) * 1e-7),
            iters=5,
        ),
    )

    def comp_loss(s, m2):
        out = composite_stream(s, cam, cfg, bg, g_mean2d=m2)
        return jnp.sum(out.image) * 0.3 + jnp.sum(out.depth) * 0.1

    comp_grad = jax.jit(jax.grad(comp_loss, argnums=1))
    print(
        "composite fwd+bwd+routing:",
        time_fn(
            comp_grad,
            args_fn=lambda i: (st, st.splats.mean2d + jnp.float32(i) * 1e-7),
            iters=5,
        ),
    )

    fwd = jax.jit(lambda a, c: render(a, c, impl="pallas", config=cfg).image)
    print("full fwd:", time_fn(lambda a: fwd(a, cam), args_fn=jiggle, iters=5))

    @jax.jit
    def full_grad(params, alive, camera, target):
        def loss(params):
            c = cloud.replace(**params, alive=alive)
            out = render(activate_cloud(c), camera, impl="pallas", config=cfg)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jax.grad(loss)(params)

    p0 = cloud.param_dict()
    print(
        "full fwd+bwd:",
        time_fn(
            lambda p: full_grad(p, cloud.alive, cam, target),
            args_fn=lambda i: (dict(p0, means=p0["means"] + jnp.float32(i) * 1e-7),),
            iters=5,
        ),
    )


if __name__ == "__main__":
    main()
