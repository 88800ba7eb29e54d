"""Chunk-size (G) sweep on the FULL fwd+bwd at the bench scene — round-4
grid-step-overhead hypothesis: K1/K2 device time tracks the STATIC grid size
(max_chunks = mp//G + num_tiles), not compute, so doubling G should cut
kernel time nearly in half if true.  Same-session A/B; tunnel drift cancels.

Usage: python scripts/sweep_chunk_fwdbwd.py [n] [chunks...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import jax
import jax.numpy as jnp

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.cache import enable_compilation_cache
from splatpu.obs.profiling import time_fn
from splatpu.render.api import default_config, render


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chunks = [int(c) for c in sys.argv[2:]] or [256, 512, 1024]
    w, h = 1280, 720

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    target = jnp.full((3, h, w), 0.3)
    params = cloud.param_dict()
    alive = cloud.alive
    base = default_config(n)

    def make_fn(g):
        mp = -(-base.max_pairs // g) * g
        cfg = dataclasses.replace(base, chunk_pairs=g, max_pairs=mp)

        @jax.jit
        def fwd_bwd(params, alive, target):
            def loss(params):
                c = cloud.replace(**params, alive=alive)
                out = render(activate_cloud(c), cam, impl="pallas", config=cfg)
                return jnp.mean(jnp.abs(out.image - target)) + 0.0 * jnp.mean(
                    out.depth
                )

            l, grads = jax.value_and_grad(loss)(params)
            return l, grads["means"]

        return fwd_bwd

    # Distinct inputs per iteration (tunnel memoizes identical executions).
    import numpy as np

    rng = np.random.default_rng(0)
    variants = []
    for i in range(6):
        p = dict(params)
        p["means"] = params["means"] + jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32) * 1e-4
        )
        variants.append(p)

    for g in chunks:
        fn = make_fn(g)
        try:
            r = time_fn(
                fn,
                args_fn=lambda i: (variants[i % len(variants)], alive, target),
                iters=12,
            )
            mp = base.max_pairs
            steps = mp // g + (-(-w // 32)) * (-(-h // 32))
            print(
                f"G={g:5d}: {r['mean_ms']:7.2f} ms (spread {r['spread_ms']:.2f})"
                f"  static grid steps={steps}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"G={g}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
