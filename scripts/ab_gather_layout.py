"""A/B: 1-D s32 gather (T(1024) layout, ~6.6 ns/element measured) vs the
same gather phrased over a 2-D T(8,128)-layout table (the (NREC, N) record
gather costs ~0.08 ns/element/row) — round-4 trace follow-up for
`offsets[gid_sorted]` (exact.py invert-by-sort)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.obs.profiling import time_fn

N = 100_000
P = 400_128


def main():
    ks = jax.random.split(jax.random.key(0), 8)
    offs = [
        jax.random.randint(k, (N,), 0, 1 << 22, dtype=jnp.int32) for k in ks
    ]
    gids = [
        jax.random.randint(k, (P,), 0, N, dtype=jnp.int32) for k in ks
    ]

    @jax.jit
    def direct(o, g):
        return jnp.sum(o[g])

    @jax.jit
    def via_2d_f32(o, g):
        t = o.astype(jnp.float32)[None, :]          # (1, N) T(8,128)
        return jnp.sum(t[:, g].astype(jnp.int32))

    @jax.jit
    def via_2d_rows8(o, g):
        t = jnp.broadcast_to(o.astype(jnp.float32)[None, :], (8, o.shape[0]))
        return jnp.sum(t[0:1, g].astype(jnp.int32))

    a = int(direct(offs[0], gids[0]))
    b = int(via_2d_f32(offs[0], gids[0]))
    assert a == b, (a, b)

    for name, fn in [("direct_1d", direct), ("via_2d_f32", via_2d_f32),
                     ("via_2d_rows8", via_2d_rows8)]:
        r = time_fn(fn, args_fn=lambda i: (offs[i % 8], gids[i % 8]), iters=24)
        print(f"{name}: {r['mean_ms']:.3f} ms (spread {r['spread_ms']:.3f})")


if __name__ == "__main__":
    main()
