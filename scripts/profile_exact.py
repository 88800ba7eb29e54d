"""Stage bisection for the exact render path — scalar outputs only.

Through the axon tunnel, jit OUTPUTS cost ~5 ms/MB (transfer), so each stage
is measured as a jitted function reduced to a scalar.  Stage deltas give the
incremental cost.

Usage: python scripts/profile_exact.py [n] [w] [h] [max_span] [pairs] [tile] [G]
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
from splatpu.render.binning import BinningConfig
from splatpu.render import exact


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    span = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 1 << 20
    tile = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    g = int(sys.argv[7]) if len(sys.argv) > 7 else 256

    cloud = make_random_cloud(jax.random.key(0), n, extent=1.2, scale_range=(0.005, 0.02))
    cam = make_lookat_camera(eye=(0, 0, -4.0), width=w, height=h, focal=0.8 * w)
    cfg = BinningConfig(max_span=span, max_pairs=pairs, chunk_pairs=g, tile=tile)
    args0 = activate_cloud(cloud)
    target = jnp.full((3, h, w), 0.3)

    def jig(i):
        return (args0.means3d + jnp.float32(i) * 1e-7,)

    def t(name, f):
        r = time_fn(jax.jit(f), args_fn=jig, iters=5)
        print(f"{name}: {r['mean_ms']:.1f} ms")
        return r["mean_ms"]

    def sum_tree(x):
        return sum(jnp.sum(l) for l in jax.tree.leaves(x) if l.dtype != bool)

    # A: preprocess only
    t("A preprocess", lambda m: sum_tree(preprocess(args0.replace(means3d=m), cam)))

    # B: full binning (emit + scatter + sort + ranges + inverse perm)
    def upto_stream(m):
        st = exact.build_exact_stream(args0.replace(means3d=m), cam, cfg)
        return (
            jnp.sum(st.gid) + jnp.sum(st.start) + jnp.sum(st.end)
            + jnp.sum(st.lane) + jnp.sum(st.splats.depth)
        )
    t("B binning", upto_stream)

    # C: + record table + gather
    def upto_records(m):
        a = args0.replace(means3d=m)
        st = exact.build_exact_stream(a, cam, cfg)
        table = exact._pack_table(
            st.splats.mean2d, st.splats.conic, st.g_colors, st.g_opacity,
            st.splats.depth,
        )
        return jnp.sum(table[:, st.gid]) + jnp.sum(st.start)
    t("C binning+gather", upto_records)

    # D: full forward
    def fwd(m):
        out = render(args0.replace(means3d=m), cam, impl="pallas", config=cfg)
        return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)
    t("D full fwd", fwd)

    # E: full fwd+bwd (scalar via grad-sum)
    gf = jax.grad(fwd)
    t("E full fwd+bwd", lambda m: jnp.sum(jnp.abs(gf(m))))

    # F: routing alone (fixed stream, fake grads)
    st0 = jax.jit(lambda m: exact.build_exact_stream(args0.replace(means3d=m), cam, cfg))(
        args0.means3d
    )
    fake = jnp.ones((exact.NREC, cfg.max_pairs), jnp.float32)

    def route(g):
        return jnp.sum(
            exact._route_to_table(g, st0.offsets, st0.counts, exact.pos_of_slot_of(st0.offsets, st0.gid, st0.lane), 10)
        )
    r = time_fn(
        jax.jit(route), args_fn=lambda i: (fake + jnp.float32(i) * 1e-7,), iters=5
    )
    print(f"F routing alone: {r['mean_ms']:.1f} ms")


if __name__ == "__main__":
    main()
