"""Binning sub-stage profiling (emission scatter / sort / align / gathers)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.core.projection import preprocess, tile_rect
from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.binning import TILE, BinningConfig, _depth_bits_for, tile_grid


def main():
    n = 100_000
    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=1280, height=720, focal=0.8 * 1280)
    cfg = BinningConfig(max_span=64, max_pairs=1 << 21, chunk_pairs=256)
    args0 = activate_cloud(cloud)
    tiles_x, tiles_y = tile_grid(cam)
    num_tiles = tiles_x * tiles_y
    depth_bits = _depth_bits_for(num_tiles)
    S, MP = cfg.max_span, cfg.max_pairs

    jig = lambda i: (args0.replace(means3d=args0.means3d + jnp.float32(i) * 1e-7), cam)

    def emit(a, cam):
        sp = preprocess(a, cam)
        tx0, ty0, tx1, ty1 = tile_rect(sp.mean2d, sp.radius, tiles_x, tiles_y, TILE)
        span_w = jnp.where(sp.visible, tx1 - tx0, 0)
        span_h = jnp.where(sp.visible, ty1 - ty0, 0)
        count = jnp.minimum(span_w * span_h, S)
        offsets = jnp.cumsum(count) - count
        s = jnp.arange(S, dtype=jnp.int32)[None, :]
        valid = s < count[:, None]
        safe_w = jnp.maximum(span_w, 1)[:, None]
        sy = s // safe_w
        sx = s - sy * safe_w
        tile_id = (ty0[:, None] + sy) * tiles_x + (tx0[:, None] + sx)
        key = (tile_id.astype(jnp.uint32) << depth_bits) | jnp.uint32(1)
        slot = jnp.where(valid, offsets[:, None] + s, MP)
        return key, slot, sp

    def emit_scatter(a, cam):
        key, slot, sp = emit(a, cam)
        kb = jnp.full((MP,), jnp.uint32(0xFFFFFFFF)).at[slot.reshape(-1)].set(
            key.reshape(-1), mode="drop"
        )
        gb = jnp.zeros((MP,), jnp.int32).at[slot.reshape(-1)].set(
            jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, S)).reshape(-1),
            mode="drop",
        )
        return kb, gb

    print("emit (no scatter):", time_fn(jax.jit(emit), args_fn=jig, iters=5)["mean_ms"])
    print("emit+scatter:", time_fn(jax.jit(emit_scatter), args_fn=jig, iters=5)["mean_ms"])

    kb, gb = jax.jit(emit_scatter)(*jig(0))
    srt = jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=0, num_keys=1))
    print(
        "sort:",
        time_fn(
            srt,
            args_fn=lambda i: (kb ^ jnp.uint32(i & 1), gb),
            iters=5,
        )["mean_ms"],
    )

    ks, gs = srt(kb, gb)
    sp0 = jax.jit(preprocess)(args0, cam)

    def gathers(g, sp):
        return sp.mean2d[g], sp.conic[g], sp.depth[g]

    print(
        "record gathers (2M):",
        time_fn(
            jax.jit(gathers),
            args_fn=lambda i: (jnp.clip(gs + i, 0, n - 1), sp0),
            iters=5,
        )["mean_ms"],
    )


if __name__ == "__main__":
    main()
