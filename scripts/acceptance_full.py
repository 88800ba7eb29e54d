"""Full-scale acceptance runs (BASELINE configs 2 and 3) on synthetic ground
truth — the environment has no CMU-Panoptic data or egress, so a procedurally
generated scene at the REAL workload shape stands in (same resolution, camera
count, iteration schedule; reference workload definitions:
`/root/reference/densify.py:218`, `/root/reference/train.py:728-741`).

Stage 1 (config 2 shape): fit 100k+ Gaussians from a degraded init over 27
cameras at 1280x720 through the full 30k-iteration densification schedule.

Stage 2 (config 3 shape): 150-timestep rollout with the rigidity regularizer
trained to convergence (loss plateau), on host-staged uint8 views (the full
view set at this shape is ~11 GB — exceeds HBM, exercising the host staging
path the reference lacks).

Usage:
    python scripts/acceptance_full.py stage1 [--iters 30000] [--out PATH]
    python scripts/acceptance_full.py stage2 [--timesteps 150] [--iters 60]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WIDTH, HEIGHT = 1280, 720
CAMERAS = 27
TRUTH_N = 120_000  # overridable via --width/--height/--cameras/--truth-n


def build_truth_and_cams(jax, np):
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud

    truth = make_random_cloud(
        jax.random.key(0), TRUTH_N, extent=1.0, scale_range=(0.004, 0.02)
    )
    rng = np.random.default_rng(1)
    cams = []
    for i in range(CAMERAS):
        a = 2 * np.pi * i / CAMERAS
        eye = (
            4.0 * np.sin(a),
            0.4 + 0.6 * rng.standard_normal(),
            -4.0 * np.cos(a),
        )
        cams.append(
            make_lookat_camera(
                eye=eye, width=WIDTH, height=HEIGHT, focal=0.8 * WIDTH
            )
        )
    return truth, cams


class ViewLike:
    pass


def fresh_metrics_path(out_dir: Path, name: str, resuming: bool) -> Path:
    """Metrics JSONL path; pre-existing files from a PREVIOUS run are rotated
    aside (MetricsLogger appends, and mixing runs in one file contaminated
    the round-2 overflow evidence).  A resumed run keeps appending."""
    path = out_dir / name
    if path.exists() and not resuming:
        i = 1
        while (rotated := path.with_suffix(f".prev{i}.jsonl")).exists():
            i += 1
        path.rename(rotated)
        print(f"  rotated stale metrics -> {rotated.name}")
    return path


def staging_binning(jax, cloud, cams):
    """Demand-sized binning for ground-truth staging renders: the targets
    themselves must never be truncated (round-2 lesson — everything trained
    downstream is only as good as the staged truth)."""
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.render.api import demand_binning, measure_binning_demand

    d_pairs, d_span = measure_binning_demand(
        activate_cloud(cloud),
        cams[0],
        jnp.stack([c.w2c for c in cams]),
        jnp.stack([c.K for c in cams]),
    )
    return demand_binning(d_pairs, d_span, headroom=1.5), d_pairs


def render_views(jax, np, cloud, cams, uint8=False, with_seg=True):
    """Ground-truth views: one batched render + one stacked fetch."""
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.render.api import render

    # The jitted batch below quantizes on-device when uint8; seg masks must
    # stay f32, so the two modes are mutually exclusive (stage 2 stages
    # uint8 images and no segs; stage 1 stages f32 images + segs).
    assert not (uint8 and with_seg)
    binning, _ = staging_binning(jax, cloud, cams)

    @jax.jit
    def batch(args, w2cs, Ks):
        def one(w2c, K):
            cam = cams[0].replace(w2c=w2c, K=K)
            out = render(args, cam, config=binning)
            return out.image, out.overflowed

        imgs, ovf = jax.vmap(one)(w2cs, Ks)
        if uint8:
            # Quantize on device: the host fetch through the TPU tunnel is
            # bandwidth-bound, and uint8 is 4x smaller than f32.
            imgs = jnp.rint(jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return imgs, jnp.any(ovf)

    margs = activate_cloud(cloud)
    w2cs = jnp.stack([c.w2c for c in cams])
    Ks = jnp.stack([c.K for c in cams])
    imgs, ovf = batch(margs, w2cs, Ks)
    assert not bool(ovf), "ground-truth staging render overflowed its budget"
    imgs = np.asarray(imgs)
    # Segmentation targets are a stage-1 input only; at 150 timesteps x 27
    # cams the f32 masks would cost 44 GB of host RAM for nothing.
    if with_seg:
        segs, ovf = batch(
            margs.replace(colors=cloud.segmentation_masks), w2cs, Ks
        )
        assert not bool(ovf), "seg staging render overflowed its budget"
        segs = np.asarray(segs)
    else:
        segs = None
    views = []
    for i, cam in enumerate(cams):
        v = ViewLike()
        v.camera_index = i
        v.w2c, v.K = np.asarray(cam.w2c), np.asarray(cam.K)
        v.width, v.height = WIDTH, HEIGHT
        if uint8:
            v.image = imgs[i]  # already uint8 from the device
        else:
            v.image = np.clip(imgs[i], 0.0, 1.0).astype(np.float32)
        if segs is not None:
            v.segmentation = segs[i].astype(np.float32)
        views.append(v)
    return views


def run_stage1(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import activate_cloud
    from splatpu.io.checkpoint import save_cloud
    from splatpu.obs.metrics import MetricsLogger
    from splatpu.obs.quality import psnr
    from splatpu.render.api import render
    from splatpu.train.stage1 import Stage1Config, fit

    t0 = time.time()
    truth, cams = build_truth_and_cams(jax, np)
    views = render_views(jax, np, truth, cams)
    print(f"[{time.time()-t0:.0f}s] ground truth rendered ({CAMERAS} cams @ {WIDTH}x{HEIGHT})")

    pc = np.concatenate(
        [
            np.asarray(truth.means),
            np.clip(np.asarray(truth.colors), 0.0, 1.0),
            (np.asarray(truth.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    keep = np.random.default_rng(0).choice(len(pc), size=len(pc) // 3, replace=False)
    pc = pc[keep]
    print(f"init points: {len(pc)} (densification must ~3x the cloud)")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(
        jsonl_path=fresh_metrics_path(
            out_dir, "stage1_metrics.jsonl", args.resume_from is not None
        )
    )
    overrides = {}
    if args.max_pairs:
        overrides["max_pairs"] = args.max_pairs
    if args.max_span:
        overrides["max_span"] = args.max_span
    import dataclasses

    from splatpu.growth.densify import DensifyConfig

    dcfg = DensifyConfig()
    if args.prune_opacity_final is not None:
        # Deviation knob (VERDICT r4 item 4): the reference's iteration-5000
        # opacity-0.25 prune (`external.py:289`) leaves ~41k Gaussians at
        # this scene — capacity-limited at 720p (PSNR plateau 33.7).  A
        # relaxed final prune measures whether 720p quality is prune-bound
        # (a parity property) or pipeline-bound (a bug).
        dcfg = dataclasses.replace(
            dcfg, prune_opacity_final=args.prune_opacity_final
        )
    cfg = Stage1Config(
        iterations=args.iters,
        capacity_factor=6.0,
        densify=dcfg,
        checkpoint_every=args.checkpoint_every or 2500,
        checkpoint_path=str(out_dir / "stage1_ckpt.msgpack"),
        views_per_step=args.views_per_step,
        binning_overrides=overrides or None,
    )
    result_path = out_dir / "stage1_result.json"

    def on_iteration(i, cloud, metrics):
        # Incremental evidence (an interrupted run keeps its latest numbers).
        rec = {
            "config": "BASELINE config 2 shape (synthetic)",
            "iterations_done": i + 1,
            "iterations_total": args.iters,
            "cameras": CAMERAS,
            "resolution": f"{WIDTH}x{HEIGHT}",
            "last": {
                k: float(v) for k, v in metrics.items() if np.ndim(v) == 0
            },
            "wall_seconds": time.time() - t0,
            "completed": False,
        }
        result_path.write_text(json.dumps(rec, indent=2))

    cloud, metrics = fit(
        pc, views, scene_radius=4.4, config=cfg, logger=logger, progress=True,
        resume_from=args.resume_from, on_iteration=on_iteration,
    )
    dt = time.time() - t0
    print(f"[{dt:.0f}s] stage1 done; alive={int(cloud.n_alive())}")

    eval_binning, _ = staging_binning(jax, cloud, cams)
    render_jit = jax.jit(
        lambda a, w2c, K: render(
            a, cams[0].replace(w2c=w2c, K=K), config=eval_binning
        ).image
    )
    margs = activate_cloud(cloud)
    ps = [
        float(psnr(render_jit(margs, jnp.asarray(v.w2c), jnp.asarray(v.K)),
                   jnp.asarray(v.image)))
        for v in views[:5]
    ]
    result = {
        "config": "BASELINE config 2 shape (synthetic)",
        "prune_opacity_final": (
            args.prune_opacity_final
            if args.prune_opacity_final is not None
            else 0.25
        ),
        "gaussians_final": int(cloud.n_alive()),
        "iterations": args.iters,
        "cameras": CAMERAS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "psnr_first5_views": ps,
        "psnr_mean": float(np.mean(ps)),
        "wall_seconds": dt,
        "completed": True,
    }
    save_cloud(out_dir / "densified_cloud.npz", cloud)
    (out_dir / "stage1_result.json").write_text(json.dumps(result, indent=2))
    logger.close()
    print(json.dumps(result, indent=2))


def run_stage2(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.core.types import activate_cloud
    from splatpu.io.checkpoint import load_cloud
    from splatpu.obs.metrics import MetricsLogger
    from splatpu.obs.quality import psnr
    from splatpu.render.api import render
    from splatpu.train.stage2 import Stage2Config, rollout_step, train

    t0 = time.time()
    truth, cams = build_truth_and_cams(jax, np)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    cloud_path = Path(args.cloud) if args.cloud else out_dir / "densified_cloud.npz"
    if cloud_path.exists():
        initial = load_cloud(cloud_path)
        print(f"loaded stage-1 cloud: {cloud_path}")
    else:
        initial = truth  # fall back: animate the ground-truth static cloud
        print("no stage-1 cloud found; animating the ground-truth cloud")

    # 'Juggle'-like motion: a foreground blob rotates + bobs while the
    # background stays static (rigidity acts on the foreground graph).
    # Amplitudes are CLI-tunable: the reference's real workloads (CMU juggle)
    # move hands/balls a modest fraction of the scene over 150 frames; the
    # round-2 default (0.01 rad/step = 86 degrees total) was far outside that
    # class and unlearnable for the reference's 0.01-scaled deformation head.
    fg = np.asarray(truth.segmentation_masks)[:, 0] > 0.5
    base = np.asarray(truth.means)
    center = base[fg].mean(0, keepdims=True)
    rot_rate = args.rot_rate
    bob_amp = args.bob_amp

    def moved_cloud(t):
        phase = 2 * np.pi * t / 50.0  # one bob per 50 timesteps
        a = rot_rate * t
        rot = np.array(
            [
                [np.cos(a), 0, -np.sin(a)],
                [0, 1, 0],
                [np.sin(a), 0, np.cos(a)],
            ],
            np.float32,
        )
        m = base.copy()
        m[fg] = (base[fg] - center) @ rot.T + center
        m[fg, 1] += bob_amp * np.sin(phase)
        return truth.replace(means=jnp.asarray(m))

    print(f"[{time.time()-t0:.0f}s] rendering {args.timesteps} timesteps x {CAMERAS} cams (uint8 host staging)")

    from splatpu.core.types import activate_cloud as _activate
    from splatpu.render.api import default_config, render as _render

    w2cs = jnp.stack([jnp.asarray(c.w2c) for c in cams])
    Ks = jnp.stack([jnp.asarray(c.K) for c in cams])

    truth_binning, truth_demand = staging_binning(jax, truth, cams)

    @jax.jit
    def stage_batch(margs):
        def one(w2c, K):
            cam = cams[0].replace(w2c=w2c, K=K)
            out = _render(margs, cam, config=truth_binning)
            return out.image, out.overflowed

        imgs, ovf = jax.vmap(one)(w2cs, Ks)
        imgs = jnp.rint(jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return imgs, jnp.any(ovf)

    # Staged ground truth is deterministic (seeded); cache the uint8 frames on
    # disk so a re-run (e.g. after an OOM in training) skips ~10 min of
    # rendering + tunnel fetches.  memmap'd load: the host-staging path only
    # reads the picked views per step.  A cached file is only trusted if the
    # heuristic budget it was rendered under actually held the measured truth
    # demand (the round-2 cache predates demand-sized staging).
    motion_tag = (
        "" if (rot_rate, bob_amp) == (0.01, 0.15)  # round-2 cache filename
        else f"_r{rot_rate:g}_b{bob_amp:g}"
    )
    cache = out_dir / f"staged_views_t{args.timesteps}_c{CAMERAS}{motion_tag}.npy"
    old_budget = default_config(int(truth.means.shape[0])).max_pairs
    cache_valid = truth_demand <= old_budget
    if cache.exists() and cache_valid:
        all_imgs = np.load(cache, mmap_mode="r")
        print(f"  staged views loaded from cache: {cache} "
              f"(t=0 demand {truth_demand} <= staged budget {old_budget})")
    else:
        if cache.exists():
            print(
                f"  cache INVALID (measured demand {truth_demand}"
                f" pairs > old budget {old_budget}); re-rendering"
            )
        all_imgs = np.empty(
            (args.timesteps, CAMERAS, 3, HEIGHT, WIDTH), np.uint8
        )
        for t in range(1, args.timesteps + 1):
            imgs_t, ovf_t = stage_batch(_activate(moved_cloud(t)))
            assert not bool(ovf_t), f"truth staging overflow at t={t}"
            all_imgs[t - 1] = np.asarray(imgs_t)
            if t % 25 == 0:
                print(f"  [{time.time()-t0:.0f}s] {t}/{args.timesteps}")
        np.save(cache, all_imgs)
    views_by_timestep = []
    for t in range(args.timesteps):
        vs = []
        for i, cam in enumerate(cams):
            v = ViewLike()
            v.camera_index = i
            v.w2c, v.K = np.asarray(cam.w2c), np.asarray(cam.K)
            v.width, v.height = WIDTH, HEIGHT
            v.image = all_imgs[t, i]
            vs.append(v)
        views_by_timestep.append(vs)

    logger = MetricsLogger(
        jsonl_path=fresh_metrics_path(
            out_dir, "stage2_metrics.jsonl", args.resume_from is not None
        )
    )
    overrides = {}
    if args.max_pairs:
        overrides["max_pairs"] = args.max_pairs
    if args.max_span:
        overrides["max_span"] = args.max_span
    cfg = Stage2Config(
        total_iterations=args.iters,
        warmup_iterations=max(1, args.iters // 10),
        learning_rate=args.lr,
        hidden_dim=args.hidden,
        residual_blocks=args.blocks,
        timestep_count=args.timesteps,
        view_staging=args.view_staging,
        checkpoint_every=5,
        checkpoint_path=str(out_dir / "stage2_ckpt.msgpack"),
        binning_overrides=overrides or None,
        quirk_compat=not args.no_quirk,
        delta_scale=args.delta_scale,
        double_residual=not args.no_double_residual,
        zero_init_head=args.zero_init_head,
    )

    # The training/eval cloud and initial encoding, exactly as stage2.setup
    # builds them (compacted stage-1 cloud) — needed BEFORE train() returns so
    # mid-run rollout evals can run from the on_iteration hook.
    from splatpu.dynamics.deform import normalize_and_encode_means_and_rotations
    from splatpu.train.stage2 import compact_cloud

    dense_cloud = compact_cloud(initial)
    enc_init = normalize_and_encode_means_and_rotations(
        dense_cloud.means, dense_cloud.rotation_quaternions,
        quirk_compat=cfg.quirk_compat,
    )
    eval_binning, _ = staging_binning(jax, dense_cloud, cams)
    render_jit = jax.jit(
        lambda a, w2c, K: render(
            a, cams[0].replace(w2c=w2c, K=K), config=eval_binning
        ).image
    )
    roll = jax.jit(
        lambda npar, c0, ei, ep, ts: rollout_step(npar, c0, ei, ep, ts, cfg)
    )

    def eval_rollout(net_params):
        """Autoregressive rollout PSNR vs ground truth at t=1, T/2, T
        (`train.py:550-613` eval semantics, PSNR instead of image loss)."""
        enc_prev = enc_init
        psnrs = {}
        for t in range(1, args.timesteps + 1):
            rolled, enc_prev = roll(
                net_params, dense_cloud, enc_init, enc_prev, jnp.float32(t)
            )
            if t in (1, args.timesteps // 2, args.timesteps):
                v = views_by_timestep[t - 1][0]
                img = render_jit(
                    activate_cloud(rolled), jnp.asarray(v.w2c), jnp.asarray(v.K)
                )
                target = jnp.asarray(v.image.astype(np.float32) / 255.0)
                psnrs[f"t{t}"] = float(psnr(img, target))
        return psnrs

    def overflow_stats():
        path = out_dir / "stage2_metrics.jsonl"
        if not path.exists():
            return {}
        rows = [json.loads(l) for l in path.open()]
        flags = [r["binning_overflow"] for r in rows if "binning_overflow" in r]
        return {
            "steps_logged": len(flags),
            "overflow_steps": int(sum(f > 0 for f in flags)),
            "overflow_max": float(max(flags, default=0.0)),
        }

    # Merge-on-load: a RESUMED run must keep the rollout-PSNR series it
    # accumulated before the interruption (the round-3 no-quirk run resumed
    # and committed a 1-point series that could not show the curve's shape —
    # VERDICT r3 weak #3).
    psnr_series = []
    prior_result = out_dir / "stage2_result.json"
    if args.resume_from and prior_result.exists():
        try:
            psnr_series = json.loads(prior_result.read_text()).get(
                "rollout_psnr_series", []
            )
            print(f"  resumed rollout_psnr_series: {len(psnr_series)} points")
        except (json.JSONDecodeError, OSError):
            pass
    result = {
        "config": args.label
        or "BASELINE config 3 shape (synthetic juggle-like)",
        "gaussians": int(truth.means.shape[0]),
        "animated_cloud": str(cloud_path) if cloud_path.exists() else
        f"ground-truth cloud ({int(truth.means.shape[0])} Gaussians)",
        "timesteps": args.timesteps,
        "sequence_iterations_total": args.iters,
        "motion": {"rot_rate": args.rot_rate, "bob_amp": args.bob_amp},
        "resolution": f"{WIDTH}x{HEIGHT}",
        "cameras": CAMERAS,
        "head": {
            "lr": args.lr,
            "delta_scale": args.delta_scale,
            "double_residual": not args.no_double_residual,
            "zero_init_head": args.zero_init_head,
            "quirk_compat": not args.no_quirk,
        },
    }

    def write_result(seq_it_done, metrics, final=False):
        # Incremental evidence: a run killed at ANY point leaves the latest
        # numbers on disk (round-2 lesson — a 23/30-iteration run left no
        # result file at all).
        logger.flush()
        result.update(
            sequence_iterations_done=seq_it_done,
            total_steps_done=seq_it_done * args.timesteps,
            last_step={
                k: float(v)
                for k, v in (metrics or {}).items()
                if np.ndim(v) == 0
            },
            binning=overflow_stats(),
            rollout_psnr_series=psnr_series,
            wall_seconds=time.time() - t0,
            completed=final,
        )
        (out_dir / "stage2_result.json").write_text(json.dumps(result, indent=2))

    iters_this_run = [0]
    stopped_early = [False]

    def on_iteration(seq_it, net_params, resolved_cfg, metrics):
        result["max_pairs"] = resolved_cfg.binning.max_pairs
        done = seq_it + 1
        if done % 5 == 0 or done == args.iters:
            psnr_series.append({"seq_it": done, **eval_rollout(net_params)})
            print(f"  [{time.time()-t0:.0f}s] rollout PSNR @ seqit {done}: "
                  f"{psnr_series[-1]}")
        write_result(done, metrics)
        iters_this_run[0] += 1
        if (
            args.stop_after
            and iters_this_run[0] >= args.stop_after
            and done < args.iters
            and done % 5 == 0  # only stop on a checkpoint boundary
        ):
            # Chunked execution: the axon tunnel client retains every
            # device_put'd host buffer (~2.1 GB per host-staged sequence
            # iteration at config-3 shape), so long runs bound each
            # process's lifetime and resume from the checkpoint.
            print(f"  [{time.time()-t0:.0f}s] chunk boundary at seqit "
                  f"{done}: stopping for restart (RSS bound)")
            stopped_early[0] = True
            return True

    net_params, dense_cloud, enc_init, last_metrics = train(
        initial, views_by_timestep, cfg, logger=logger, progress=True,
        on_iteration=on_iteration, resume_from=args.resume_from,
    )
    dt = time.time() - t0
    if stopped_early[0]:
        # The incremental write_result already recorded the honest state
        # (completed=False, true iteration count); the wrapper loop resumes.
        logger.close()
        print(f"[{dt:.0f}s] stage2 chunk done (not final)")
        sys.exit(3)
    print(f"[{dt:.0f}s] stage2 done")

    rows = [json.loads(l) for l in (out_dir / "stage2_metrics.jsonl").open()]
    k = args.timesteps
    totals = [r["total"] for r in rows if "total" in r]
    result["loss_first_seqit"] = float(np.mean(totals[:k]))
    result["loss_last_seqit"] = float(np.mean(totals[-k:]))
    result["rollout_psnr"] = psnr_series[-1] if psnr_series else {}
    write_result(args.iters, last_metrics, final=True)
    logger.close()
    print(json.dumps(result, indent=2))


def main():
    # Line-buffer stdout so progress lines reach a redirected log as they
    # happen (long background runs are monitored by tailing the log).
    sys.stdout.reconfigure(line_buffering=True)
    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["stage1", "stage2"])
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--timesteps", type=int, default=150)
    p.add_argument("--out", default="/tmp/acceptance")
    p.add_argument("--cloud", default=None)
    p.add_argument("--resume-from", default=None,
                   help="resume stage1 fit() / stage2 train() from this"
                        " checkpoint path")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="stage1 checkpoint cadence override (iterations)")
    p.add_argument("--max-pairs", type=int, default=None,
                   help="stage1 binning override (e.g. restoring a grown"
                        " budget across a pre-format-change checkpoint)")
    p.add_argument("--max-span", type=int, default=None)
    p.add_argument("--no-quirk", action="store_true",
                   help="stage2: correct interleaved sin/cos positional "
                        "encoding instead of the reference's cos-of-sin "
                        "quirk (`train.py:125`)")
    p.add_argument("--rot-rate", type=float, default=0.003,
                   help="stage2 motion: fg rotation rad/timestep")
    p.add_argument("--bob-amp", type=float, default=0.1,
                   help="stage2 motion: fg vertical bob amplitude")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, default=128,
                   help="deformation-net hidden dim (reference CLI arg)")
    p.add_argument("--blocks", type=int, default=3,
                   help="deformation-net residual blocks (reference CLI arg)")
    p.add_argument("--label", default=None,
                   help="result.json config label (the round-3 config-4 "
                        "smoke mislabeled itself as config 3)")
    p.add_argument("--view-staging", default="host",
                   choices=["host", "device_u8", "device"],
                   help="stage2 view staging; device_u8 avoids the axon "
                        "tunnel's per-device_put host-buffer retention "
                        "entirely when the u8 view set fits HBM")
    p.add_argument("--stop-after", type=int, default=None,
                   help="stage2: cleanly stop after N sequence iterations "
                        "in THIS process (chunked execution; resume with "
                        "--resume-from to continue)")
    p.add_argument("--delta-scale", type=float, default=0.01,
                   help="deformation head output scale (reference: 0.01,"
                        " `train.py:303,307`; >0.01 is a deviation)")
    p.add_argument("--no-double-residual", action="store_true",
                   help="deviation: drop the reference's network-adds-input"
                        " residual (`train.py:108`)")
    p.add_argument("--zero-init-head", action="store_true",
                   help="deviation: zero-init the output layer")
    p.add_argument("--views-per-step", type=int, default=1)
    p.add_argument("--prune-opacity-final", type=float, default=None,
                   help="stage1: override the i=5000 final-prune opacity "
                        "threshold (reference: 0.25, `external.py:289`)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--cameras", type=int, default=None)
    p.add_argument("--truth-n", type=int, default=None)
    args = p.parse_args()

    global WIDTH, HEIGHT, CAMERAS, TRUTH_N
    WIDTH = args.width or WIDTH
    HEIGHT = args.height or HEIGHT
    CAMERAS = args.cameras or CAMERAS
    TRUTH_N = args.truth_n or TRUTH_N

    from splatpu.obs.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.stage == "stage1":
        args.iters = args.iters or 30_000
        run_stage1(args)
    else:
        args.iters = args.iters or 60
        run_stage2(args)


if __name__ == "__main__":
    main()
