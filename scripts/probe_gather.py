"""Probe: gather strategies for the two 1M-element permutation gathers.

G1  XLA column gather with RANDOM indices (the real workload)
G2  XLA column gather with IOTA indices (locality sensitivity)
G3  XLA row gather (P, NREC) random
P1  Pallas in-kernel dynamic gather from a VMEM-resident (NREC, N) table
    (tab[:, idx] with a traced index vector) — compiles on Mosaic or not?
P2  Pallas in-kernel jnp.take_along_axis variant

If P1/P2 compile and are fast, both the record gather and the routing gather
can move inside kernels and the XLA permutation gathers disappear.

Usage: python scripts/probe_gather.py [n] [log2_pairs]
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

from splatpu.obs.profiling import time_fn

NREC = 16


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    lp = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mp = 1 << lp

    key = jax.random.key(0)
    table = jax.random.normal(key, (NREC, n), jnp.float32)
    idx_rand = jax.random.randint(jax.random.key(1), (mp,), 0, n, jnp.int32)
    idx_iota = (jnp.arange(mp, dtype=jnp.int32) * n // mp).astype(jnp.int32)
    table_t = table.T

    def t(name, f, args_fn):
        try:
            r = time_fn(jax.jit(f), args_fn=args_fn, iters=5)
            print(f"{name}: {r['mean_ms']:.1f} ms")
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:160]})")

    jig = lambda i: (table + jnp.float32(i) * 1e-9,)
    jig_t = lambda i: (table_t + jnp.float32(i) * 1e-9,)

    t("G1 XLA col gather random", lambda tb: jnp.sum(tb[:, idx_rand]), jig)
    t("G2 XLA col gather iota", lambda tb: jnp.sum(tb[:, idx_iota]), jig)
    t("G3 XLA row gather random", lambda tb: jnp.sum(tb[idx_rand]), jig_t)

    # Pallas in-kernel gather: grid over index chunks; table fully in VMEM.
    G = 512

    def pk1(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:, idx_ref[0, :]]

    def pk2(idx_ref, tab_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[0, :][None, :], (NREC, G))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=1)

    def make_pallas(kernel):
        def f(tb, idx):
            return pl.pallas_call(
                kernel,
                grid=(mp // G,),
                in_specs=[
                    pl.BlockSpec((1, G), lambda k: (0, k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((NREC, n), lambda k: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((NREC, G), lambda k: (0, k),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NREC, mp), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(idx.reshape(1, mp), tb)

        return f

    for name, kern in (("P1 pallas tab[:, idx]", pk1),
                       ("P2 pallas take_along_axis", pk2)):
        f = make_pallas(kern)
        t(name, lambda tb, f=f: jnp.sum(f(tb, idx_rand)), jig)


if __name__ == "__main__":
    main()
