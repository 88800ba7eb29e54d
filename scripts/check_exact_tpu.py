"""Exact-path correctness + full fwd/bwd benchmark on real TPU.

Compares the exact path against the padded path numerically (small scene) and
times full jitted loss+grad (scalar-ish outputs, distinct inputs/iter to dodge
tunnel memoization; see NOTES_R2.md landmines).

Usage: python scripts/check_exact_tpu.py [n] [w] [h]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    # --- correctness at small scale, compiled on TPU ---
    cloud_s = make_random_cloud(jax.random.key(3), 512)
    cam_s = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=64, height=48)
    cfg_s = BinningConfig(max_span=64, max_pairs=1 << 13, chunk_pairs=128)
    args_s = activate_cloud(cloud_s)

    def loss_of(impl):
        def f(a):
            out = render(a, cam_s, impl=impl, config=cfg_s)
            return (
                jnp.mean(jnp.abs(out.image - 0.4))
                + 0.1 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.final_transmittance)
            )
        return f

    for ref_impl in ("stream",):
        img_ref = jax.jit(lambda a: render(a, cam_s, impl=ref_impl, config=cfg_s).image)(args_s)
        img_new = jax.jit(lambda a: render(a, cam_s, impl="pallas", config=cfg_s).image)(args_s)
        err = float(jnp.max(jnp.abs(img_ref - img_new)))
        print(f"image max|diff| vs {ref_impl}: {err:.2e}")
        g_ref = jax.jit(jax.grad(lambda m: loss_of(ref_impl)(args_s.replace(means3d=m))))(args_s.means3d)
        g_new = jax.jit(jax.grad(lambda m: loss_of("pallas")(args_s.replace(means3d=m))))(args_s.means3d)
        scale = float(jnp.max(jnp.abs(g_ref))) + 1e-12
        gerr = float(jnp.max(jnp.abs(g_ref - g_new))) / scale
        print(f"means3d grad rel max|diff| vs {ref_impl}: {gerr:.2e}")

    # --- benchmark at full scale ---
    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = BinningConfig(max_span=64, max_pairs=1 << 21, chunk_pairs=256)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)

    def jig(i):
        return (args0.means3d + jnp.float32(i) * 1e-7,)

    for impl in ("pallas", "pallas_padded"):
        def loss(m):
            out = render(args0.replace(means3d=m), cam, impl=impl, config=cfg)
            return jnp.mean(jnp.abs(out.image - target))

        fwd = jax.jit(loss)
        fwdbwd = jax.jit(jax.grad(loss))
        r_f = time_fn(fwd, args_fn=jig, iters=5)
        r_b = time_fn(lambda m: jnp.sum(jnp.abs(fwdbwd(m))), args_fn=jig, iters=5)
        print(f"{impl}: full fwd {r_f['mean_ms']:.1f} ms | full fwd+bwd {r_b['mean_ms']:.1f} ms")


if __name__ == "__main__":
    main()
