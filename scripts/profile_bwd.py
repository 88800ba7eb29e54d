"""Backward-pass bisection for the exact render path on real TPU.

Times, with a FIXED pre-built stream (binning excluded):
  K1  forward composite kernel alone
  K2  backward composite kernel alone
  K3  routing (pair grads -> per-Gaussian table grads)
  K4  preprocess fwd+bwd alone (activation + projection chain)
  K5  composite custom_vjp fwd+bwd (K1+K2+K3 + glue)
  K6  full render fwd+bwd (everything incl. binning fwd + preprocess bwd)

Usage: python scripts/profile_bwd.py [n] [w] [h] [G] [kernel]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

from splatpu.core.projection import preprocess
from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig, tile_grid
from splatpu.render import exact


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    G = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    kernel = sys.argv[5] if len(sys.argv) > 5 else "grid"
    scan = sys.argv[6] if len(sys.argv) > 6 else "mxu"
    quick = len(sys.argv) > 7 and sys.argv[7] == "quick"

    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    mp_budget = 1 << 20 if n <= 150_000 else 1 << 22
    cfg = BinningConfig(max_span=32, max_pairs=mp_budget, chunk_pairs=G, kernel=kernel, scan=scan)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)
    tiles_x, tiles_y = tile_grid(cam)
    num_tiles = tiles_x * tiles_y
    C = 3

    st = jax.jit(lambda a: exact.build_exact_stream(a, cam, cfg))(args0)
    print(f"pairs: {int(st.total_pairs)} / {cfg.max_pairs}  G={G} kernel={kernel} scan={scan}")
    table0 = jax.jit(
        lambda s: exact._pack_table(
            s.splats.mean2d, s.splats.conic, s.g_colors, s.g_opacity, s.splats.depth
        )
    )(st)
    records0 = jax.jit(lambda t, g: t[:, g])(table0, st.gid)
    bg2 = jnp.zeros((C, 1))

    def t(name, f, args_fn):
        r = time_fn(jax.jit(f), args_fn=args_fn, iters=5)
        print(f"{name}: {r['mean_ms']:.1f} ms")
        return r["mean_ms"]

    jig_rec = lambda i: (records0 + jnp.float32(i) * 1e-9,)
    bg_row = jnp.zeros((1, C))

    # K1: forward kernel alone (grid flavor only; packed output)
    def k1(records):
        packed = exact._fwd_call_grid(
            records, st.start, st.end, bg_row,
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=cfg.scan,
        )
        return jnp.sum(packed)

    t("K1 fwd kernel", k1, jig_rec)

    # K2: backward kernel alone (uses fixed fwd residuals)
    packed0 = jax.jit(
        lambda r: exact._fwd_call_grid(
            r, st.start, st.end, bg_row,
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=cfg.scan,
        )
    )(records0)
    cot = jnp.concatenate(
        [
            jnp.ones((num_tiles, exact.NPIX, C)) / (w * h),
            jnp.ones((num_tiles, exact.NPIX, 1)) * 0.1 / (w * h),
            jnp.zeros((num_tiles, exact.NPIX, exact.PACK - C - 1)),
        ],
        axis=-1,
    )

    def k2(records):
        grads = exact._bwd_call_grid(
            records, st.start, st.end, bg_row, packed0, cot,
            num_tiles=num_tiles, tiles_x=tiles_x, G=G, C=C, scan=cfg.scan,
        )
        return jnp.sum(grads)

    t("K2 bwd kernel", k2, jig_rec)

    if quick:
        # K5 only after K1/K2 in quick mode
        static = (num_tiles, tiles_x, G, C, cfg.max_span, kernel, cfg.scan)

        def k5(table):
            def loss(tb):
                img, dep, tfin = exact._composite_table(
                    tb, jnp.zeros((C,)), st.gid, st.start, st.end,
                    st.offsets, st.counts, st.lane, static,
                )
                return jnp.sum(img) / (w * h) + 0.1 * jnp.sum(dep) / (w * h)

            return jnp.sum(jax.grad(loss)(table))

        t("K5 composite fwd+bwd", k5, lambda i: (table0 + jnp.float32(i) * 1e-9,))
        return

    # K3: routing alone
    fake = jnp.ones((exact.NREC, cfg.max_pairs), jnp.float32)

    def k3(g):
        return jnp.sum(exact._route_to_table(g, st.offsets, st.counts, exact.pos_of_slot_of(st.offsets, st.gid, st.lane), 10))

    t("K3 routing", k3, lambda i: (fake + jnp.float32(i) * 1e-9,))

    # K4: preprocess fwd+bwd
    def pp_loss(m):
        sp = preprocess(args0.replace(means3d=m), cam)
        return (
            jnp.sum(sp.mean2d) + jnp.sum(sp.conic) + jnp.sum(sp.depth)
            + jnp.sum(sp.radius)
        )

    gpp = jax.grad(pp_loss)
    t("K4 preprocess fwd+bwd", lambda m: jnp.sum(gpp(m)),
      lambda i: (args0.means3d + jnp.float32(i) * 1e-7,))

    # K5: composite custom_vjp fwd+bwd over fixed stream
    static = (num_tiles, tiles_x, G, C, cfg.max_span, kernel, cfg.scan)

    def k5(table):
        def loss(tb):
            img, dep, tfin = exact._composite_table(
                tb, jnp.zeros((C,)), st.gid, st.start, st.end,
                st.offsets, st.counts, st.lane, static,
            )
            return jnp.sum(img) / (w * h) + 0.1 * jnp.sum(dep) / (w * h)

        return jnp.sum(jax.grad(loss)(table))

    t("K5 composite fwd+bwd", k5, lambda i: (table0 + jnp.float32(i) * 1e-9,))

    # K6: full render fwd+bwd
    def k6(m):
        def loss(mm):
            out = render(args0.replace(means3d=mm), cam, impl="pallas", config=cfg)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jnp.sum(jnp.abs(jax.grad(loss)(m)))

    t("K6 full fwd+bwd", k6, lambda i: (args0.means3d + jnp.float32(i) * 1e-7,))


if __name__ == "__main__":
    main()
