"""Pre-warm the bench executable's XLA compile (and the persistent cache).

On the axon TPU platform the compile helper runs OUTSIDE the execution FIFO,
so warming can proceed concurrently with a long training run; a later
`python bench.py` then hits `~/.cache/splatpu_xla` and skips its ~7-12 min
cache-miss remote compile.  The jit must be reproduced EXACTLY — same
function structure, same static config, same closed-over constants — or the
cache key misses (NOTES_R3.md environment landmine 0).

Usage:  python scripts/warm_bench.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    import bench
    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import default_config, render

    on_tpu = jax.default_backend() == "tpu"
    n = bench.N_GAUSSIANS if on_tpu else 2_000
    w, h = (bench.WIDTH, bench.HEIGHT) if on_tpu else (256, 256)

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    config = default_config(n)
    impl = "pallas" if on_tpu else "stream"
    target = jnp.zeros((3, h, w))

    # EXACT copy of bench.py's jitted function (same closure constants).
    @jax.jit
    def fwd_bwd(params, alive, camera, target):
        def loss(params):
            c = cloud.replace(**params, alive=alive)
            out = render(activate_cloud(c), camera, impl=impl, config=config)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jax.grad(loss)(params)

    t0 = time.time()
    print("lowering + compiling bench fwd_bwd ...", flush=True)
    fwd_bwd.lower(cloud.param_dict(), cloud.alive, cam, target).compile()
    print(f"compiled in {time.time() - t0:.0f}s (cache warm)")


if __name__ == "__main__":
    main()
