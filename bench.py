"""Benchmark: differentiable rasterizer forward+backward ms/frame.

Headline metric (BASELINE.md north star): full fwd+bwd of the tiled
differentiable renderer on a 100k-Gaussian cloud at 1280x720, single chip.

Prints ONE JSON line:
  {"metric": "rasterize_fwd_bwd_ms_per_frame", "value": ..., "unit": "ms",
   "vs_baseline": ...}

`vs_baseline` is speedup vs BASELINE_MS, a nominal 10 ms/frame figure for the
reference CUDA rasterizer's fwd+bwd on a contemporary datacenter GPU at this
workload (the reference publishes no numbers — BASELINE.md records
`published: {}` — so this anchor is an estimate, kept fixed across rounds so
the trend is comparable).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 10.0
N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1280, 720
WARMUP = 2
ITERS = 10


def main(chained: int = 0):
    import jax

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import default_config, render

    on_tpu = jax.default_backend() == "tpu"
    n = N_GAUSSIANS if on_tpu else 2_000
    w, h = (WIDTH, HEIGHT) if on_tpu else (256, 256)

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    # The product-default budget heuristic (~8 pairs/Gaussian, chunk-aligned).
    config = default_config(n)
    impl = "pallas" if on_tpu and _pallas_available() else "stream"
    target = jnp.zeros((3, h, w))

    # NOTE: everything device-resident is passed as a jit ARGUMENT — on the
    # axon TPU platform, arrays closed over by a jitted function are embedded
    # as constants and cost ~30 ms per execution (re-marshalled every call).
    @jax.jit
    def fwd_bwd(params, alive, camera, target):
        def loss(params):
            c = cloud.replace(**params, alive=alive)
            out = render(activate_cloud(c), camera, impl=impl, config=config)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jax.grad(loss)(params)

    cloud_params = cloud.param_dict()

    # Distinct inputs per iteration (the tunnel memoizes identical
    # executions), pre-materialized outside the timed region, completion
    # observed via host fetch (block_until_ready returns early on the tunnel).
    from splatpu.obs.profiling import time_fn

    stats = time_fn(
        fwd_bwd,
        warmup=WARMUP,
        iters=ITERS,
        args_fn=lambda i: (
            dict(cloud_params, means=cloud_params["means"] + jnp.float32(i) * 1e-7),
            cloud.alive,
            cam,
            target,
        ),
    )
    ms = stats["mean_ms"]

    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_ms_per_frame",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )
    )

    if chained:
        # Dispatch-amortized ms/frame: N frames rendered by ONE executable
        # (lax.scan chaining each frame's mean-gradient into the next frame's
        # means, so no step can be elided) — one tunnel dispatch total.
        # This is the production-serving shape; the difference vs the
        # per-dispatch number above MEASURES the fixed tunnel dispatch cost
        # instead of subtracting an estimate.
        @jax.jit
        def fwd_bwd_chain(params, alive, camera, target):
            def body(means, _):
                g = fwd_bwd(dict(params, means=means), alive, camera, target)
                return means + 1e-12 * g["means"], ()

            final, _ = jax.lax.scan(
                body, params["means"], None, length=chained
            )
            return final

        cstats = time_fn(
            fwd_bwd_chain,
            warmup=1,
            iters=4,
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
        cms = cstats["mean_ms"] / chained
        print(
            json.dumps(
                {
                    "metric": "rasterize_fwd_bwd_ms_per_frame_chained",
                    "value": round(cms, 3),
                    "unit": "ms",
                    "chain_length": chained,
                    "vs_baseline": round(BASELINE_MS / cms, 4),
                }
            )
        )


def _pallas_available() -> bool:
    try:
        from splatpu.render import pallas_composite  # noqa: F401

        return True
    except Exception:
        return False


if __name__ == "__main__":
    import sys

    chained = 0
    if "--chained" in sys.argv:
        idx = sys.argv.index("--chained")
        chained = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 8
    main(chained=chained)
