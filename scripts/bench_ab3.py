"""bench.py-harness A/B: prod scan + chunk size variants at tile=32."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

    def cfg(**kw):
        base = dict(tile=32, max_pairs=400_128, chunk_pairs=256)
        base.update(kw)
        return BinningConfig(**base)

    variants = [
        ("t32 mxu2 G256 (default)", cfg()),
        ("t32 prod G256", cfg(scan="prod")),
        ("t32 prod G512", cfg(scan="prod", chunk_pairs=512, max_pairs=400_384)),
        ("t32 mxu2 G512", cfg(chunk_pairs=512, max_pairs=400_384)),
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
