"""A/B the headline bench harness across binning configs.

Exactly bench.py's measurement (grads wrt ALL cloud params through
activate_cloud, same cloud/camera/target, same time_fn hygiene) with a
config loop — resolves sweep-vs-bench discrepancies where the sweeps
differentiate means3d only.
"""

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
from splatpu.render.api import default_config, render
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
        ("t32 default (cull on)", default_config(N, tile=32)),
        ("t16 default (cull on)", default_config(N, tile=16)),
        (
            "t32 cull off",
            import_dc(default_config(N, tile=32), cull_tiles=False),
        ),
        (
            "t16 cull off",
            import_dc(default_config(N, tile=16), cull_tiles=False),
        ),
        (
            "t32 tie off",
            import_dc(default_config(N, tile=32), exact_tie_order=False),
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
            f"{name}: {stats['mean_ms']:.1f} ms (spread {stats['spread_ms']:.1f})"
            f"  [pairs budget {config.max_pairs}, chunk {config.chunk_pairs}]",
            flush=True,
        )


def import_dc(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


if __name__ == "__main__":
    main()
