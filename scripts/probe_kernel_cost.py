"""Probe: what does a chunk-grid step actually cost on v5e?

Runs stripped-down variants of the forward compositing grid kernel over the
REAL chunk tables of the bench scene:
  V0  grid + block DMA + per-chunk (1,G) row ops only (no NPIX x G temps)
  V8  V0 + 8 materialized (NPIX, G) elementwise ops
  V16 V0 + 16
  V32 V0 + 32
  VT  V0 + 2 transcendental (exp) ops on (NPIX, G)

The V-deltas separate grid/DMA overhead from VMEM-traffic cost of full-size
temporaries, which decides whether kernel optimization should target op count
(VMEM-bound) or something else.

Usage: python scripts/probe_kernel_cost.py [n] [G]
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.binning import BinningConfig, tile_grid
from splatpu.render import exact

NPIX = exact.NPIX
NREC = exact.NREC


def probe_kernel(tile_s, blk_s, lo_s, hi_s, first_s, last_s, records_ref,
                 img_ref, acc, *, n_temps: int, trans: bool, G: int):
    k = pl.program_id(0)
    lo = lo_s[k]
    hi = hi_s[k]
    first = first_s[k] == 1
    last = last_s[k] == 1

    @pl.when((lo < hi) | first | last)
    def _run():
        @pl.when(first)
        def _():
            acc[:] = jnp.zeros((NPIX, 1), jnp.float32)

        @pl.when(lo < hi)
        def _compute():
            row = records_ref[0:1, :] * 0.5 + records_ref[1:2, :]
            if n_temps or trans:
                pixi = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
                px = pixi.astype(jnp.float32)
                x = px - row  # (NPIX, G) temp 1
                cnt = 1
                while cnt < n_temps:
                    x = x * 0.999 + row
                    cnt += 1
                if trans:
                    x = jnp.exp(-jnp.abs(x))
                    x = jnp.log1p(x * 0.5)
                acc[:] += jnp.sum(x, axis=1, keepdims=True)
            else:
                acc[:] += jnp.sum(row)

        @pl.when(last)
        def _():
            img_ref[0] = acc[:]


def make_call(tables, records, num_tiles, G, n_temps, trans):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(tables[0].shape[0],),
        in_specs=[
            pl.BlockSpec((NREC, G), lambda k, tile_s, blk_s, *_: (0, blk_s[k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NPIX, 1), lambda k, tile_s, *_: (tile_s[k], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((NPIX, 1), jnp.float32)],
    )
    kernel = functools.partial(probe_kernel, n_temps=n_temps, trans=trans, G=G)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*tables, records)


def probe_kernel4(tile_s, blk_s, lo_s, hi_s, first_s, last_s, records_ref,
                  img_ref, o2_ref, o3_ref, o4_ref, acc, *, G: int):
    k = pl.program_id(0)
    lo = lo_s[k]
    hi = hi_s[k]
    first = first_s[k] == 1
    last = last_s[k] == 1

    @pl.when((lo < hi) | first | last)
    def _run():
        @pl.when(first)
        def _():
            acc[:] = jnp.zeros((NPIX, 1), jnp.float32)

        @pl.when(lo < hi)
        def _compute():
            row = records_ref[0:1, :] * 0.5 + records_ref[1:2, :]
            acc[:] += jnp.sum(row)

        @pl.when(last)
        def _():
            img_ref[0] = acc[:]
            o2_ref[0] = acc[:] * 2.0
            o3_ref[0] = acc[:] * 3.0
            o4_ref[0] = acc[:] * 4.0


def make_call4(tables, records, num_tiles, G):
    tb = lambda k, tile_s, *_: (tile_s[k], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(tables[0].shape[0],),
        in_specs=[
            pl.BlockSpec((NREC, G), lambda k, tile_s, blk_s, *_: (0, blk_s[k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NPIX, 1), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), tb, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((NPIX, 1), jnp.float32)],
    )
    kernel = functools.partial(probe_kernel4, G=G)
    sh = jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[sh, sh, sh, sh],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*tables, records)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2,
                              scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=1280, height=720, focal=1024.0)
    cfg = BinningConfig(max_span=32, max_pairs=1 << 20, chunk_pairs=G)
    args0 = activate_cloud(cloud)
    tiles_x, tiles_y = tile_grid(cam)
    num_tiles = tiles_x * tiles_y

    st = jax.jit(lambda a: exact.build_exact_stream(a, cam, cfg))(args0)
    tables = jax.jit(
        lambda s, e: exact._chunk_tables(s, e, num_tiles, cfg.max_pairs, G, False)
    )(st.start, st.end)
    records0 = jnp.ones((NREC, cfg.max_pairs), jnp.float32)
    real = int(jax.jit(lambda t: jnp.sum(t[4] * 0 + (t[2] < t[3])))(tables))
    print(f"grid steps: {tables[0].shape[0]}, nonempty-chunk steps: {real}")

    def t(name, n_temps, trans):
        f = jax.jit(lambda r: jnp.sum(
            make_call(tables, r, num_tiles, G, n_temps, trans)[0]))
        stats = time_fn(f, args_fn=lambda i: (records0 + jnp.float32(i) * 1e-9,),
                        iters=5)
        print(f"{name}: {stats['mean_ms']:.1f} ms")

    t("V0 (no NPIXxG temps)", 0, False)
    t("V8", 8, False)
    t("V16", 16, False)
    t("V32", 32, False)
    t("VT (16 + exp/log1p)", 16, True)

    f4 = jax.jit(lambda r: sum(jnp.sum(o) for o in
                               make_call4(tables, r, num_tiles, G)))
    stats = time_fn(f4, args_fn=lambda i: (records0 + jnp.float32(i) * 1e-9,),
                    iters=5)
    print(f"V0x4out (4 output blocks): {stats['mean_ms']:.1f} ms")


if __name__ == "__main__":
    main()
