"""Capture a jax.profiler trace of the renderer fwd+bwd and summarize it.

VERDICT round-2 item 3: take an ON-DEVICE trace of the composite kernels
before any further restructuring — the round-2 wins came from measurement.
This script traces N executions of the bench-scene fwd+bwd, then parses the
perfetto trace JSON itself (no TensorBoard available in this environment)
and prints the top device ops by total duration.

Usage: python scripts/trace_kernels.py [--n 100000] [--iters 4] [--out DIR]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize(trace_dir: str, top: int = 40):
    files = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ) + sorted(glob.glob(f"{trace_dir}/**/*.trace.json", recursive=True))
    if not files:
        print(f"NO trace files under {trace_dir} — the tunnel may not "
              "deliver device traces; falling back to stage bisection "
              "(scripts/profile_exact2.py) is the measurement of record.")
        return
    path = files[-1]
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device lanes: pid/tid names containing TPU/device; fall back to all
    # complete ('X') events.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, n in names.items()
        if any(k in n.lower() for k in ("tpu", "device", "xla"))
    }
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        d = float(e.get("dur", 0.0)) / 1000.0  # us -> ms
        durs[e.get("name", "?")] += d
        counts[e.get("name", "?")] += 1
        total += d
    print(f"trace: {path}")
    print(f"{'total ms':>10}  {'count':>6}  op")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d:10.2f}  {counts[name]:6d}  {name[:110]}")
    print(f"{'':>10}  (sum of device op durations: {total:.1f} ms)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--out", default="/tmp/splatpu_trace")
    p.add_argument("--parse-only", default=None,
                   help="skip capture; summarize this trace dir")
    args = p.parse_args()

    if args.parse_only:
        summarize(args.parse_only)
        return

    import jax

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import default_config, render

    cloud = make_random_cloud(
        jax.random.key(0), args.n, extent=1.2, scale_range=(0.005, 0.02)
    )
    cam = make_lookat_camera(
        eye=(0, 0, -4.0), width=args.width, height=args.height,
        focal=0.8 * args.width,
    )
    config = default_config(args.n)
    target = jnp.zeros((3, args.height, args.width))

    @jax.jit
    def fwd_bwd(params, alive, camera, target):
        def loss(params):
            c = cloud.replace(**params, alive=alive)
            out = render(activate_cloud(c), camera, impl="pallas", config=config)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        return jax.grad(loss)(params)

    cp = cloud.param_dict()
    print("warming ...")
    g = fwd_bwd(cp, cloud.alive, cam, target)
    jax.block_until_ready(g)
    float(jax.tree.leaves(g)[0].ravel()[0])

    print(f"tracing {args.iters} executions -> {args.out}")
    jax.profiler.start_trace(args.out)
    for i in range(args.iters):
        g = fwd_bwd(
            dict(cp, means=cp["means"] + jnp.float32(i) * 1e-7),
            cloud.alive, cam, target,
        )
    float(jax.tree.leaves(g)[0].ravel()[0])  # force completion inside trace
    jax.profiler.stop_trace()
    summarize(args.out)


if __name__ == "__main__":
    main()
