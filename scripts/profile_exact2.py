"""Clean stage bisection for the exact render path.

Unlike profile_exact.py (kept for history), EVERY device array is a jit
argument — closure-captured arrays are embedded constants on the axon
platform and cost ~30 ms/exec in re-marshalling, which dwarfed the stages.

Usage: python scripts/profile_exact2.py [n] [w] [h] [pairs] [tile] [G]
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
from splatpu.render import exact
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 393_216
    tile = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    g = int(sys.argv[6]) if len(sys.argv) > 6 else 256

    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = BinningConfig(max_pairs=pairs, chunk_pairs=g, tile=tile)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)

    def t(name, f, args_fn, iters=6):
        r = time_fn(jax.jit(f), args_fn=args_fn, iters=iters)
        print(f"{name}: {r['mean_ms']:.1f} ms (spread {r['spread_ms']:.1f})", flush=True)

    def jig_args(i):
        return (args0.replace(means3d=args0.means3d + jnp.float32(i) * 1e-7),)

    def sum_tree(x):
        return sum(
            jnp.sum(l) for l in jax.tree.leaves(x)
            if hasattr(l, "dtype") and l.dtype != bool
        )

    # A: preprocess fwd
    t("A preprocess fwd", lambda a: sum_tree(preprocess(a, cam)), jig_args)

    # B: full binning (build_exact_stream)
    t(
        "B binning",
        lambda a: sum_tree(
            (lambda st: (st.gid, st.start, st.end, st.lane))(
                exact.build_exact_stream(a, cam, cfg)
            )
        ),
        jig_args,
    )

    # Materialize a fixed stream + records for the kernel-only stages.
    st = jax.jit(lambda a: exact.build_exact_stream(a, cam, cfg))(args0)
    table = jax.jit(
        lambda s: exact._pack_table(
            s.splats.mean2d, s.splats.conic, s.g_colors, s.g_opacity,
            s.splats.depth,
        )
    )(st)
    records = jax.jit(lambda tb, gid: tb[:, gid])(table, st.gid)
    tiles_x = -(-w // tile)
    tiles_y = -(-h // tile)
    num_tiles = tiles_x * tiles_y
    bg_row = jnp.zeros((1, 3))

    # C: record gather alone
    t(
        "C record gather",
        lambda tb, gid: jnp.sum(tb[:, gid]),
        lambda i: (table + jnp.float32(i) * 1e-9, st.gid),
    )

    # D: forward kernel alone
    def k1(records, start, end, bg_row):
        return jnp.sum(
            exact._fwd_call_grid(
                records, start, end, bg_row,
                num_tiles=num_tiles, tiles_x=tiles_x, G=g, C=3,
                scan=cfg.scan, tile=tile,
            )
        )

    t(
        "D fwd kernel",
        k1,
        lambda i: (records + jnp.float32(i) * 1e-9, st.start, st.end, bg_row),
    )

    # E: backward kernel alone (fixed fwdout + cotangents)
    npix = tile * tile
    fwdout = jax.jit(
        lambda records, start, end, bg_row: exact._fwd_call_grid(
            records, start, end, bg_row,
            num_tiles=num_tiles, tiles_x=tiles_x, G=g, C=3,
            scan=cfg.scan, tile=tile,
        )
    )(records, st.start, st.end, bg_row)
    cot = jnp.ones((num_tiles, npix, exact.PACK), jnp.float32)

    def k2(records, start, end, bg_row, fwdout, cot):
        return jnp.sum(
            exact._bwd_call_grid(
                records, start, end, bg_row, fwdout, cot,
                num_tiles=num_tiles, tiles_x=tiles_x, G=g, C=3,
                scan=cfg.scan, tile=tile,
            )
        )

    t(
        "E bwd kernel",
        k2,
        lambda i: (
            records + jnp.float32(i) * 1e-9, st.start, st.end, bg_row,
            fwdout, cot,
        ),
    )

    # F: routing alone
    fake = jnp.ones((exact.NREC, cfg.max_pairs), jnp.float32)
    t(
        "F routing",
        lambda grads, off, cnt, pos: jnp.sum(
            exact._route_to_table(grads, off, cnt, pos, 10)
        ),
        lambda i: (
            fake + jnp.float32(i) * 1e-9, st.offsets, st.counts, exact.pos_of_slot_of(st.offsets, st.gid, st.lane)
        ),
    )

    # G: full fwd / H: full fwd+bwd via the public API
    def fwd(a, target):
        out = render(a, cam, impl="pallas", config=cfg)
        return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

    t("G full fwd", fwd, lambda i: (*jig_args(i), target))

    def fwdbwd(a, target):
        return jnp.sum(jnp.abs(jax.grad(lambda m: fwd(a.replace(means3d=m), target))(a.means3d)))

    t("H full fwd+bwd", fwdbwd, lambda i: (*jig_args(i), target))


if __name__ == "__main__":
    main()
