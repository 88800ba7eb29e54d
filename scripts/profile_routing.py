"""Micro-bisection of gradient routing (pair grads -> per-Gaussian grads).

Times the two candidate layouts for the big permutation gather and the cumsum
that the current `_route_to_table` uses, to decide what a Pallas routing
kernel must replace.

Usage: python scripts/profile_routing.py [n] [log2_pairs]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from splatpu.obs.cache import enable_compilation_cache

enable_compilation_cache()

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.obs.profiling import time_fn
from splatpu.render.binning import BinningConfig
from splatpu.render import exact


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    lp = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mp = 1 << lp

    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=1280, height=720, focal=1024.0)
    cfg = BinningConfig(max_span=32, max_pairs=mp, chunk_pairs=256)
    args0 = activate_cloud(cloud)
    st = jax.jit(lambda a: exact.build_exact_stream(a, cam, cfg))(args0)

    grads = jnp.ones((exact.NREC, mp), jnp.float32)
    grads_t = jnp.ones((mp, exact.NREC), jnp.float32)
    pos = st.pos_of_slot

    def t(name, f, args_fn):
        r = time_fn(jax.jit(f), args_fn=args_fn, iters=5)
        print(f"{name}: {r['mean_ms']:.1f} ms")

    jig = lambda i: (grads + jnp.float32(i) * 1e-9,)
    jig_t = lambda i: (grads_t + jnp.float32(i) * 1e-9,)

    # R1: column gather (current layout)
    t("R1 col gather (NREC,P)[:,perm]", lambda g: jnp.sum(g[:, pos]), jig)

    # R2: row gather on transposed layout
    t("R2 row gather (P,NREC)[perm]", lambda g: jnp.sum(g[pos]), jig_t)

    # R3: transpose + row gather
    t("R3 transpose+row gather", lambda g: jnp.sum(g.T[pos]), jig)

    # R4: cumsum along pairs (current)
    t("R4 cumsum (NREC,P) axis=1", lambda g: jnp.sum(jnp.cumsum(g, axis=1)), jig)

    # R5: cumsum on transposed layout
    t("R5 cumsum (P,NREC) axis=0", lambda g: jnp.sum(jnp.cumsum(g, axis=0)), jig_t)

    # R6: full current routing
    t(
        "R6 _route_to_table",
        lambda g: jnp.sum(exact._route_to_table(g, st.offsets, st.counts, pos, 10)),
        jig,
    )


if __name__ == "__main__":
    main()
