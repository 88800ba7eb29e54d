"""bench.py-harness A/B: round-1 baseline config vs new default vs cull-off."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import jax
import jax.numpy as jnp

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig

N = 100_000
W, H = 1280, 720


def main():
    cloud = make_random_cloud(
        jax.random.key(0), N, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=W, height=H, focal=0.8 * W)
    target = jnp.zeros((3, H, W))
    cloud_params = cloud.param_dict()

    variants = [
        (
            "round-1 baseline: t16 800k cull=off tie=off",
            BinningConfig(
                tile=16, max_pairs=800_000, chunk_pairs=128,
                cull_tiles=False, exact_tie_order=False,
            ),
        ),
        (
            "t32 400k cull=off tie=on",
            BinningConfig(
                tile=32, max_pairs=400_128, chunk_pairs=256,
                cull_tiles=False, exact_tie_order=True,
            ),
        ),
        (
            "t32 300k cull=on tie=on",
            BinningConfig(
                tile=32, max_pairs=300_032, chunk_pairs=256,
                cull_tiles=True, exact_tie_order=True,
            ),
        ),
    ]

    for name, config in variants:
        @jax.jit
        def fwd_bwd(params, alive, camera, target, config=config):
            def loss(params):
                c = cloud.replace(**params, alive=alive)
                out = render(activate_cloud(c), camera, impl="pallas", config=config)
                return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

            return jax.grad(loss)(params)

        stats = time_fn(
            fwd_bwd,
            warmup=2,
            iters=8,
            args_fn=lambda i: (
                dict(
                    cloud_params,
                    means=cloud_params["means"] + jnp.float32(i) * 1e-7,
                ),
                cloud.alive,
                cam,
                target,
            ),
        )
        print(
            f"{name}: {stats['mean_ms']:.1f} ms (spread {stats['spread_ms']:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
