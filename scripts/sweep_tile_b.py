"""Second-round exact-path sweep: fail-reduce fwd kernel (always on), scan
block sizes, tie-order cost, span_small at tile=32.

Usage: python scripts/sweep_tile_b.py [n] [w] [h]
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
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)

    t32 = dict(tile=32, max_pairs=393_216)
    variants = [
        ("t32 G256 base", BinningConfig(**t32, chunk_pairs=256)),
        ("t32 G256 scan64", BinningConfig(**t32, chunk_pairs=256, scan="mxu2:64")),
        ("t32 G256 scan32", BinningConfig(**t32, chunk_pairs=256, scan="mxu2:32")),
        ("t32 G128 scan32", BinningConfig(**t32, chunk_pairs=128, scan="mxu2:32")),
        (
            "t32 G256 no-tie",
            BinningConfig(**t32, chunk_pairs=256, exact_tie_order=False),
        ),
        (
            "t32 G256 ss8",
            BinningConfig(**t32, chunk_pairs=256, span_small=8),
        ),
        ("t16 G128 800k base", BinningConfig(tile=16, max_pairs=819_200, chunk_pairs=128)),
    ]
    for name, cfg in variants:
        @jax.jit
        def fwd_bwd(args, target, cfg=cfg):
            def loss(m):
                out = render(
                    args.replace(means3d=m), cam, impl="pallas", config=cfg
                )
                return (
                    jnp.mean(jnp.abs(out.image - target))
                    + 0.1 * jnp.mean(out.depth)
                )

            return jax.grad(loss)(args.means3d)

        jig = lambda i: (
            args0.replace(means3d=args0.means3d + jnp.float32(i) * 1e-7),
            target,
        )
        r = time_fn(fwd_bwd, args_fn=jig, iters=6)
        print(
            f"{name}: fwd+bwd {r['mean_ms']:.1f} ms (spread {r['spread_ms']:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
