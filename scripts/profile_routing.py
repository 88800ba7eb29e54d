"""Microbenchmark the gradient-routing stages at large pair budgets.

Routing (render/exact.py `_route_to_table` + the forward `table[:, gid]`
gather) is budget-linear; at 500k Gaussians / ~3.3M pairs it was measured to
dominate the composite fwd+bwd (NOTES_R2).  This script times each component
separately so the optimization target is chosen from evidence:

  A. fwd gather:   table (NREC, N) -> records (NREC, Ppad) via column gather
  B. bwd gather:   grads (10, Ppad) -> slot order (10, mp) via column gather
  C. cumsum:       (10, mp) cumsum along pairs
  D. boundary:     2x (10, N) column gathers + where
  E. full routing: B+C+D fused as _route_to_table
  F. full render fwd+bwd at this scale (context)

Usage: python scripts/profile_routing.py [--n 500000] [--budget-pairs N]
Run on an IDLE TPU (tunnel FIFO).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip-render", action="store_true",
                   help="routing components only (CPU sanity runs)")
    args = p.parse_args()

    import jax

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.obs.profiling import time_fn
    from splatpu.render.api import (
        default_config,
        demand_binning,
        measure_binning_demand,
        render,
    )
    from splatpu.render.exact import NREC, R_COLOR0, build_exact_stream

    n = args.n
    cloud = make_random_cloud(
        jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(
        eye=(0, 0, -4.0), width=args.width, height=args.height,
        focal=0.8 * args.width,
    )
    margs = activate_cloud(cloud)
    d_pairs, d_span = measure_binning_demand(
        margs, cam, cam.w2c[None], cam.K[None]
    )
    config = demand_binning(d_pairs, d_span, headroom=1.2)
    print(f"n={n} demand={d_pairs} pairs, span={d_span}; "
          f"budget={config.max_pairs}, max_span={config.max_span}")

    estream = jax.jit(
        lambda a: build_exact_stream(a, cam, config)
    )(margs)
    ppad = estream.gid.shape[0]
    mp = estream.gid.shape[0]
    print(f"pair buffer={ppad}, emission slots={mp}")

    key = jax.random.key(1)
    table = jax.random.normal(key, (NREC, n))
    grads_padded = jax.random.normal(key, (NREC, ppad))
    C = 3
    n_rows = R_COLOR0 + C

    gid = estream.gid
    pos_of_slot = jax.jit(lambda s: __import__('splatpu.render.exact', fromlist=['x']).pos_of_slot_of(s.offsets, s.gid, s.lane))(estream)
    offsets = estream.offsets
    counts = estream.counts

    @jax.jit
    def fwd_gather(table, gid):
        return table[:, gid]

    tableT = jnp.asarray(table.T)  # (N, NREC) row-major: one cache line/pair

    @jax.jit
    def fwd_gather_rows(tableT, gid):
        return tableT[gid]  # (P, NREC)

    @jax.jit
    def fwd_gather_rows_t(tableT, gid):
        return tableT[gid].T  # (NREC, P) — transposed back for the kernels

    @jax.jit
    def bwd_gather(grads, pos_of_slot):
        valid = pos_of_slot < mp
        return jnp.where(
            valid[None, :],
            grads[:n_rows, jnp.minimum(pos_of_slot, mp - 1)],
            0.0,
        )

    @jax.jit
    def bwd_gather_rows(gradsT, pos_of_slot):
        # row-major variant: transpose (2 sequential passes) + row gather
        valid = pos_of_slot < mp
        g = gradsT[jnp.minimum(pos_of_slot, mp - 1)]  # (P, n_rows)
        return jnp.where(valid[:, None], g, 0.0).T

    @jax.jit
    def cumsum_only(slotg):
        return jnp.cumsum(slotg, axis=1)

    @jax.jit
    def boundary(csum, offsets, counts):
        hi = jnp.clip(offsets + counts - 1, 0, mp - 1)
        lo = offsets - 1
        hi_v = csum[:, hi]
        lo_v = jnp.where(
            (lo >= 0)[None, :], csum[:, jnp.clip(lo, 0, mp - 1)], 0.0
        )
        return jnp.where((counts > 0)[None, :], hi_v - lo_v, 0.0)

    from splatpu.render.exact import _cumsum_pairs_pallas, _route_to_table

    @jax.jit
    def full_routing(grads, offsets, counts, pos_of_slot):
        return _route_to_table(grads, offsets, counts, pos_of_slot, n_rows)

    slotg = jax.jit(bwd_gather)(grads_padded, pos_of_slot)
    csum = jax.jit(cumsum_only)(slotg)

    def t(name, fn, args_fn):
        stats = time_fn(fn, warmup=2, iters=args.iters, args_fn=args_fn)
        print(f"{name:14s} {stats['mean_ms']:8.2f} ms  "
              f"(spread {stats['spread_ms']:.2f})")
        return stats["mean_ms"]

    j = jnp.float32(1e-7)
    t("fwd_gather", fwd_gather,
      lambda i: (table + i * j, gid))
    t("fwd_gather_rows", fwd_gather_rows,
      lambda i: (tableT + i * j, gid))
    t("fwd_gather_rows_t", fwd_gather_rows_t,
      lambda i: (tableT + i * j, gid))
    t("bwd_gather", bwd_gather,
      lambda i: (grads_padded + i * j, pos_of_slot))
    gradsT = jnp.asarray(grads_padded[:n_rows].T)
    t("bwd_gather_rows", bwd_gather_rows,
      lambda i: (gradsT + i * j, pos_of_slot))
    t("cumsum", cumsum_only, lambda i: (slotg + i * j,))

    @jax.jit
    def cumsum_pallas(slotg):
        return _cumsum_pairs_pallas(slotg)

    t("cumsum_pallas", cumsum_pallas, lambda i: (slotg + i * j,))
    t("boundary", boundary, lambda i: (csum + i * j, offsets, counts))
    t("full_routing", full_routing,
      lambda i: (grads_padded + i * j, offsets, counts, pos_of_slot))

    # Context: the full fwd+bwd at this scale.
    if args.skip_render:
        return
    target = jnp.zeros((3, args.height, args.width))

    @jax.jit
    def fwd_bwd(params, alive, camera, target):
        def loss(params):
            c = cloud.replace(**params, alive=alive)
            out = render(activate_cloud(c), camera, impl="pallas", config=config)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jax.grad(loss)(params)

    cp = cloud.param_dict()
    t("full_fwd_bwd", fwd_bwd,
      lambda i: (dict(cp, means=cp["means"] + i * j), cloud.alive, cam, target))


if __name__ == "__main__":
    main()
