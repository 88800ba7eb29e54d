"""In-session A/B: integer-div vs f32-reciprocal lane geometry on the
emission domain (round-4 perf item; same-session timing so tunnel drift
cancels).  Mimics the real fusion shape: (N, span_small) lane domain with
the rect-distance cull math consuming (sx, sy)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.obs.profiling import time_fn

N = 100_000
S = 16


def make_inputs(key):
    ks = jax.random.split(key, 6)
    span_w = jax.random.randint(ks[0], (N,), 1, 8)
    tx0 = jax.random.randint(ks[1], (N,), 0, 30)
    ty0 = jax.random.randint(ks[2], (N,), 0, 20)
    mean = jax.random.uniform(ks[3], (N, 2)) * 1000.0
    r2 = jax.random.uniform(ks[4], (N,)) * 900.0
    count = jax.random.randint(ks[5], (N,), 0, S + 1)
    return span_w, tx0, ty0, mean, r2, count


def body(sy, sx, span_w, tx0, ty0, mean, r2, count, s):
    tiles_x = 40
    tile_id = (ty0[:, None] + sy) * tiles_x + (tx0[:, None] + sx)
    tl = 32.0
    x0 = (tx0[:, None] + sx).astype(jnp.float32) * tl
    y0 = (ty0[:, None] + sy).astype(jnp.float32) * tl
    dx = mean[:, 0:1] - jnp.clip(mean[:, 0:1], x0, x0 + 31.0)
    dy = mean[:, 1:2] - jnp.clip(mean[:, 1:2], y0, y0 + 31.0)
    keep = (s < count[:, None]) & (dx * dx + dy * dy <= r2[:, None])
    rank = jnp.cumsum(keep, axis=1) - keep.astype(jnp.int32)
    key = (tile_id.astype(jnp.uint32) << 10) | jnp.uint32(3)
    val = ((jnp.arange(N, dtype=jnp.int32)[:, None] << 5) | rank).astype(jnp.uint32)
    return jnp.sum(jnp.where(keep, key, 0)) + jnp.sum(val)


@jax.jit
def old_div(span_w, tx0, ty0, mean, r2, count):
    s = jnp.arange(S, dtype=jnp.int32)[None, :]
    safe_w = jnp.maximum(span_w, 1)[:, None]
    sy = s // safe_w
    sx = s - sy * safe_w
    return body(sy, sx, span_w, tx0, ty0, mean, r2, count, s)


@jax.jit
def new_recip(span_w, tx0, ty0, mean, r2, count):
    s = jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_w = 1.0 / jnp.maximum(span_w, 1).astype(jnp.float32)
    sy = jnp.floor((s.astype(jnp.float32) + 0.5) * inv_w[:, None]).astype(jnp.int32)
    sx = s - sy * span_w[:, None]
    return body(sy, sx, span_w, tx0, ty0, mean, r2, count, s)


def main():
    inputs = [make_inputs(jax.random.key(i)) for i in range(8)]
    # Equality first.
    for inp in inputs[:2]:
        a = old_div(*inp)
        b = new_recip(*inp)
        assert int(a) == int(b), (int(a), int(b))
    for name, fn in [("int_div", old_div), ("f32_recip", new_recip)]:
        r = time_fn(
            fn, args_fn=lambda i: inputs[i % len(inputs)], iters=30
        )
        print(f"{name}: {r['mean_ms']:.3f} ms (spread {r['spread_ms']:.3f})")


if __name__ == "__main__":
    main()
