"""Stage-2 19 dB plateau diagnostics (round-4 VERDICT item 1).

Cheap measurements that split the hypothesis space BEFORE any long run:

1. Do-nothing baseline: PSNR of the UNDEFORMED stage-1 cloud vs the moving
   ground truth at t in {1, 75, 150}.  If the trained rollout (~19 dB at all
   t) is no better than this, the network learned ~nothing; if it is WORSE at
   t=1, training actively smeared early timesteps.
2. Learned deformation magnitude: |delta means| on fg/bg rows of the rolled
   cloud at t in {1, 75, 150} vs the TRUE fg displacement of the synthetic
   motion — did the 0.01-scaled head (`/root/reference/train.py:303-307`)
   reach the required amplitude at all?
3. Required raw-output magnitude for this workload (analytic): the reference
   head computes means_t = init + 0.01*(raw + init), so raw must reach
   100*disp - init_means; report the fg p95 of that target.

Usage: python scripts/diag_stage2.py [--ckpt PATH --no-quirk] ...
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.acceptance_full import build_truth_and_cams  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cloud", default="runs/acceptance_s1/densified_cloud.npz")
    p.add_argument("--ckpt", default="runs/acceptance_s1/stage2_ckpt.msgpack")
    p.add_argument("--no-quirk", action="store_true")
    p.add_argument("--timesteps", type=int, default=150)
    p.add_argument("--rot-rate", type=float, default=0.003)
    p.add_argument("--bob-amp", type=float, default=0.1)
    p.add_argument("--eval-ts", type=int, nargs="*", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import activate_cloud
    from splatpu.io.checkpoint import load_checkpoint, load_cloud
    from splatpu.obs.cache import enable_compilation_cache
    from splatpu.obs.quality import psnr
    from splatpu.render.api import render
    from splatpu.train.stage2 import Stage2Config, compact_cloud, rollout_step
    from splatpu.dynamics.deform import normalize_and_encode_means_and_rotations
    from splatpu.dynamics.network import init_deformation_net
    from scripts.acceptance_full import staging_binning

    enable_compilation_cache()
    t0 = time.time()
    T = args.timesteps
    eval_ts = args.eval_ts or [1, T // 2, T]
    truth, cams = build_truth_and_cams(jax, np)

    fg = np.asarray(truth.segmentation_masks)[:, 0] > 0.5
    base = np.asarray(truth.means)
    center = base[fg].mean(0, keepdims=True)

    def moved_means(t):
        phase = 2 * np.pi * t / 50.0
        a = args.rot_rate * t
        rot = np.array(
            [[np.cos(a), 0, -np.sin(a)], [0, 1, 0], [np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        m = base.copy()
        m[fg] = (base[fg] - center) @ rot.T + center
        m[fg, 1] += args.bob_amp * np.sin(phase)
        return m

    fitted = compact_cloud(load_cloud(args.cloud))
    print(f"[{time.time()-t0:.0f}s] fitted cloud: {int(fitted.capacity)} rows")

    tb, _ = staging_binning(jax, truth, cams)
    fb, _ = staging_binning(jax, fitted, cams)
    cam0 = cams[0]
    w2c0, K0 = jnp.asarray(cam0.w2c), jnp.asarray(cam0.K)
    render_truth = jax.jit(lambda a: render(a, cam0, config=tb).image)
    render_fit = jax.jit(lambda a: render(a, cam0, config=fb).image)

    gt_imgs = {}
    for t in [0] + eval_ts:
        gt_imgs[t] = render_truth(
            activate_cloud(truth.replace(means=jnp.asarray(moved_means(t))))
        )

    fit_img = render_fit(activate_cloud(fitted))
    report = {"donothing_psnr": {}}
    for t in [0] + eval_ts:
        report["donothing_psnr"][f"t{t}"] = round(
            float(psnr(fit_img, gt_imgs[t])), 2
        )
    # True fg displacement stats per eval timestep.
    report["true_fg_disp"] = {
        f"t{t}": {
            "mean": round(float(np.linalg.norm(moved_means(t)[fg] - base[fg], axis=1).mean()), 4),
            "max": round(float(np.linalg.norm(moved_means(t)[fg] - base[fg], axis=1).max()), 4),
        }
        for t in eval_ts
    }
    # Required raw net output (head: means_t = init + 0.01*(raw + init)).
    dmax = np.linalg.norm(moved_means(T)[fg] - base[fg], axis=1)
    raw_needed = 100.0 * dmax + np.linalg.norm(base[fg], axis=1)
    report["required_raw_output_fg"] = {
        "p50": round(float(np.percentile(raw_needed, 50)), 1),
        "p95": round(float(np.percentile(raw_needed, 95)), 1),
    }
    print(json.dumps(report, indent=2))

    if args.ckpt and Path(args.ckpt).exists():
        cfg = Stage2Config(
            total_iterations=100,
            timestep_count=T,
            hidden_dim=128,
            residual_blocks=3,
            quirk_compat=not args.no_quirk,
        )
        tmpl_net = init_deformation_net(jax.random.key(0), cfg.net_config())
        try:
            restored = load_checkpoint(
                args.ckpt, {"net_params": tmpl_net, "seq_it": jnp.int32(0)}
            )
        except (KeyError, ValueError):
            import msgpack  # noqa: F401
            from flax import serialization

            raw = Path(args.ckpt).read_bytes()
            state = serialization.msgpack_restore(raw)
            restored = {"net_params": serialization.from_state_dict(tmpl_net, state["net_params"]), "seq_it": state.get("seq_it", -1)}
        net_params = restored["net_params"]
        print(f"ckpt {args.ckpt} @ seq_it {int(restored['seq_it'])}")

        enc_init = normalize_and_encode_means_and_rotations(
            fitted.means, fitted.rotation_quaternions, quirk_compat=cfg.quirk_compat
        )
        roll = jax.jit(
            lambda npar, c0, ei, ep, ts: rollout_step(npar, c0, ei, ep, ts, cfg)
        )
        fit_fg = np.asarray(fitted.segmentation_masks)[:, 0] > 0.5
        enc_prev = enc_init
        trained = {"psnr": {}, "fg_disp": {}, "bg_disp": {}}
        for t in range(1, T + 1):
            rolled, enc_prev = roll(net_params, fitted, enc_init, enc_prev, jnp.float32(t))
            if t in eval_ts:
                img = render_fit(activate_cloud(rolled))
                trained["psnr"][f"t{t}"] = round(float(psnr(img, gt_imgs[t])), 2)
                d = np.linalg.norm(
                    np.asarray(rolled.means) - np.asarray(fitted.means), axis=1
                )
                trained["fg_disp"][f"t{t}"] = {
                    "mean": round(float(d[fit_fg].mean()), 4),
                    "max": round(float(d[fit_fg].max()), 4),
                }
                trained["bg_disp"][f"t{t}"] = {
                    "mean": round(float(d[~fit_fg].mean()), 4),
                    "max": round(float(d[~fit_fg].max()), 4),
                }
        print(json.dumps({"trained": trained}, indent=2))


if __name__ == "__main__":
    main()
