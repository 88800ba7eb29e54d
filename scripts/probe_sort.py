"""Probe: lax.sort cost vs domain size on v5e (keys u32 + carried u32).

Decides whether shrinking the binning emission domain (two-class span
emission) is worth the complexity.

Usage: python scripts/probe_sort.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

from splatpu.obs.profiling import time_fn


def main():
    for m in (1 << 20, 2 << 20, 3 << 20, 1 << 21 | 1 << 20):
        keys = jax.random.randint(
            jax.random.key(0), (m,), 0, 1 << 30, jnp.uint32, dtype=jnp.uint32
        ) if False else jax.random.bits(jax.random.key(0), (m,), jnp.uint32)
        vals = jax.random.bits(jax.random.key(1), (m,), jnp.uint32)

        def f(k, v):
            ks, vs = jax.lax.sort((k, v), dimension=0, num_keys=1)
            return jnp.sum(ks.astype(jnp.float32)) + jnp.sum(vs.astype(jnp.float32))

        r = time_fn(
            jax.jit(f),
            args_fn=lambda i: (keys ^ jnp.uint32(i + 8), vals),
            iters=5,
        )
        print(f"sort 2x{m/2**20:.2f}M u32: {r['mean_ms']:.1f} ms")


if __name__ == "__main__":
    main()
