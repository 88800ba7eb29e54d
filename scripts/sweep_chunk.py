"""Sweep exact-path chunk size (G) and kernel flavor on real TPU.

Usage: python scripts/sweep_chunk.py [n] [w] [h]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.cache import enable_compilation_cache
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)
    params = cloud.param_dict()

    for kernel, g, scan in (
        ("grid", 128, "mxu"),
        ("grid", 256, "mxu"),
        ("manual", 128, "mxu"),
    ):
            cfg = BinningConfig(
                max_span=32, max_pairs=1 << 20, chunk_pairs=g, kernel=kernel,
                scan=scan,
            )

            @jax.jit
            def fwd_bwd(means):
                def loss(m):
                    a = args0.replace(means3d=m)
                    out = render(a, cam, impl="pallas", config=cfg)
                    return (
                        jnp.mean(jnp.abs(out.image - target))
                        + 0.1 * jnp.mean(out.depth)
                    )

                return jax.grad(loss)(means)

            @jax.jit
            def fwd(means):
                a = args0.replace(means3d=means)
                out = render(a, cam, impl="pallas", config=cfg)
                return jnp.mean(out.image) + jnp.mean(out.depth)

            jig = lambda i: (args0.means3d + jnp.float32(i) * 1e-7,)
            rf = time_fn(fwd, args_fn=jig, iters=5)
            rb = time_fn(fwd_bwd, args_fn=jig, iters=5)
            print(
                f"kernel={kernel} G={g} scan={scan}: fwd {rf['mean_ms']:.1f} ms | "
                f"fwd+bwd {rb['mean_ms']:.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
