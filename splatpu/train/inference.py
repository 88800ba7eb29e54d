"""Free-viewpoint inference: autoregressive rollout + orbit-camera video export.

Mirrors reference `train.py:446-637`: five virtual cameras (yaw 0/90/180/270 at
distance 2.4, height 1.3, plus a top view at 4.5), 1280x720, per-view aspect
factors 0.82/0.52/0.52/0.52/0.35; each timestep's deformed state feeds the next
step's "previous" encoding; frames are written per camera and assembled into
mp4s, and the mean image loss vs the real views is reported per timestep.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import defaultdict
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import Camera, GaussianCloud, activate_cloud
from splatpu.render.api import render
from splatpu.train.losses import image_loss
from splatpu.train.stage2 import Stage2Config, rollout_step
from splatpu.io.video import to_uint8_frame, write_frame, write_video

RENDER_WIDTH = 1280   # `train.py:513`
RENDER_HEIGHT = 720   # `train.py:514`


def _group_by_resolution(views):
    """Views bucketed by (width, height) — each bucket gets its own jit-static
    render shape (mixed-resolution captures)."""
    groups = defaultdict(list)
    for v in views:
        groups[(int(v.width), int(v.height))].append(v)
    return groups


def create_transformation_matrix(yaw_degrees: float, height: float, distance: float):
    """`train.py:446-457`."""
    y = np.radians(yaw_degrees)
    return np.array(
        [
            [np.cos(y), 0.0, -np.sin(y), 0.0],
            [0.0, 1.0, 0.0, height],
            [np.sin(y), 0.0, np.cos(y), distance],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def create_orbit_cameras(width: int = RENDER_WIDTH, height: int = RENDER_HEIGHT):
    """`train.py:460-503` + intrinsics construction of `train.py:515-526`."""
    specs = {
        "000": (create_transformation_matrix(0, 1.3, 2.4), 0.82),
        "090": (create_transformation_matrix(90, 1.3, 2.4), 0.52),
        "180": (create_transformation_matrix(180, 1.3, 2.4), 0.52),
        "270": (create_transformation_matrix(270, 1.3, 2.4), 0.52),
        "top": (
            np.array(
                [
                    [1.0, 0.0, 0.0, 0.0],
                    [0.0, 0.0, -1.0, 0.0],
                    [0.0, 1.0, 0.0, 4.5],
                    [0.0, 0.0, 0.0, 1.0],
                ]
            ),
            0.35,
        ),
    }
    cameras = {}
    for name, (w2c, aspect) in specs.items():
        K = np.array(
            [
                [aspect * width, 0.0, width / 2.0],
                [0.0, aspect * width, height / 2.0],
                [0.0, 0.0, 1.0],
            ]
        )
        cameras[name] = Camera(
            w2c=jnp.asarray(w2c, jnp.float32),
            K=jnp.asarray(K, jnp.float32),
            width=width,
            height=height,
        )
    return cameras


def run_inference(
    net_params,
    initial_cloud: GaussianCloud,
    encoded_initial,
    config: Stage2Config,
    output_directory: Optional[Path] = None,
    views_by_timestep=None,
    fps: int = 30,
    renderer: Optional[str] = None,
    width: int = RENDER_WIDTH,
    height: int = RENDER_HEIGHT,
    logger=None,
):
    """`train.py:550-637`. Returns {camera_name: [frames (H,W,3) uint8]} and
    the per-timestep mean image losses (empty if no real views given)."""
    impl = renderer or config.renderer
    cameras = create_orbit_cameras(width, height)

    binning = config.binning
    if binning is None:
        # Size the pair budget from measured demand (orbit cameras plus, if
        # given, the timestep-0 real eval views), exactly like stage-2
        # training — the capacity heuristic silently truncated 720p renders
        # of reference-scale clouds (see stage2.train).
        from splatpu.render.api import demand_binning, measure_binning_demand

        margs = activate_cloud(initial_cloud)
        cam0_tmp = next(iter(cameras.values()))
        d_pairs, d_span = measure_binning_demand(
            margs,
            cam0_tmp,
            jnp.stack([c.w2c for c in cameras.values()]),
            jnp.stack([c.K for c in cameras.values()]),
        )
        if views_by_timestep is not None:
            for (w, h), vs in _group_by_resolution(views_by_timestep[0]).items():
                dp, ds = measure_binning_demand(
                    margs,
                    Camera(w2c=jnp.eye(4), K=jnp.eye(3), width=w, height=h),
                    np.stack([v.w2c for v in vs]),
                    np.stack([v.K for v in vs]),
                )
                d_pairs, d_span = max(d_pairs, dp), max(d_span, ds)
        binning = demand_binning(d_pairs, d_span)

    # Device arrays (cloud, encodings, camera matrices) are jit ARGUMENTS —
    # closure-captured arrays cost ~30 ms/exec on the axon platform.
    @jax.jit
    def rollout(net_params, cloud0, enc_init, enc_prev, timestep):
        return rollout_step(net_params, cloud0, enc_init, enc_prev, timestep, config)

    cam0 = next(iter(cameras.values()))
    cam_names = list(cameras.keys())
    all_w2c = jnp.stack([cameras[n].w2c for n in cam_names])
    all_K = jnp.stack([cameras[n].K for n in cam_names])

    # Grow-on-overflow, like both trainers (the demand-sized budget covers
    # the t=0 cloud + 2x headroom, but the ROLLOUT deforms the cloud every
    # timestep and a deformed splat can outgrow it): the render functions are
    # (re)built from `grow_state`, and any overflowed batch is re-rendered
    # under the doubled budget (pairs vs span targeted separately, matching
    # stage1/stage2 growth semantics).  Bounded; exhaustion falls back to the
    # warn-and-drop behavior.
    grow_state = {"binning": binning, "growths": 0}
    n_rows = int(initial_cloud.capacity)

    def _build_render_all():
        b = grow_state["binning"]

        @jax.jit
        def render_all_views(cloud: GaussianCloud, w2cs, Ks):
            # One batched render over the orbit cameras + one stacked host
            # fetch per timestep (sequential per-camera renders each paid a
            # separate dispatch + device->host round trip).
            def one(w2c, K):
                cam = cam0.replace(w2c=w2c, K=K)
                out = render(activate_cloud(cloud), cam, impl=impl, config=b)
                return out.image, out.overflowed, out.span_overflowed

            imgs, ovf, sovf = jax.vmap(one)(w2cs, Ks)
            return imgs, jnp.any(ovf), jnp.any(sovf)

        return render_all_views

    # Per-timestep evaluation vs the REAL views (`train.py:598-613`): one
    # batched render per RESOLUTION GROUP of the timestep's cameras and one
    # scalar fetch, instead of the reference's eager per-view render +
    # `.item()` loop (27 cams x 150 timesteps of tunnel round-trips would
    # dominate inference wall-clock on TPU).  Grouping by (width, height)
    # keeps mixed-resolution captures working: image sizes are jit-static,
    # so each group gets its own compiled shape (cached across timesteps,
    # rebuilt on budget growth).
    def _build_batched_loss():
        b = grow_state["binning"]

        @functools.lru_cache(maxsize=None)
        def _batched_loss_for(width: int, height: int):
            cam_static = Camera(
                w2c=jnp.eye(4), K=jnp.eye(3), width=width, height=height
            )

            @jax.jit
            def batched_sum_image_loss(cloud: GaussianCloud, w2cs, Ks, targets):
                def one(w2c, K, target):
                    cam = cam_static.replace(w2c=w2c, K=K)
                    out = render(
                        activate_cloud(cloud), cam, impl=impl, config=b
                    )
                    return image_loss(out.image, target), out.overflowed, out.span_overflowed

                losses, ovf, sovf = jax.vmap(one)(w2cs, Ks, targets)
                return jnp.sum(losses), jnp.any(ovf), jnp.any(sovf)

            return batched_sum_image_loss

        return _batched_loss_for

    fns = {"render_all": _build_render_all(), "loss_for": _build_batched_loss()}

    def _grow(span: bool) -> bool:
        """Double the exceeded budget and rebuild the render fns; False once
        the growth allowance is exhausted."""
        if grow_state["growths"] >= 4:
            return False
        from splatpu.render.binning import grow_for_span_overflow

        b = grow_state["binning"]
        if span:
            b = grow_for_span_overflow(b, n_rows)
        else:
            b = dataclasses.replace(b, max_pairs=min(b.max_pairs * 2, 1 << 24))
        grow_state["binning"] = b
        grow_state["growths"] += 1
        fns["render_all"] = _build_render_all()
        fns["loss_for"] = _build_batched_loss()
        return True

    def _with_growth(run):
        """run() -> (*payload, ovf, span_ovf); re-runs under grown budgets
        until clean or exhausted, then returns the last payload."""
        while True:
            *payload, ovf, sovf = run()
            if not bool(ovf):
                return payload
            if not _grow(span=bool(sovf)):
                _note_overflow(True)
                return payload

    def eval_mean_image_loss(cloud, views):
        total = 0.0
        for (w, h), vs in _group_by_resolution(views).items():
            w2cs = jnp.asarray(np.stack([v.w2c for v in vs]))
            Ks = jnp.asarray(np.stack([v.K for v in vs]))
            targets = np.stack([v.image for v in vs])
            if targets.dtype == np.uint8:
                targets = targets.astype(np.float32) / 255.0
            targets = jnp.asarray(targets)
            (loss,) = _with_growth(
                lambda: fns["loss_for"](w, h)(cloud, w2cs, Ks, targets)
            )
            total = total + loss
        return total / len(views)

    overflow_seen = [False]

    def _note_overflow(ovf):
        if not overflow_seen[0] and bool(ovf):
            overflow_seen[0] = True
            import warnings

            warnings.warn(
                "inference: binning pair budget overflowed — rendered frames"
                " are dropping splats (pass a larger Stage2Config.binning)",
                stacklevel=2,
            )

    def export_views(cloud, timestep: int):
        (imgs,) = _with_growth(
            lambda: fns["render_all"](cloud, all_w2c, all_K)
        )
        imgs = np.asarray(imgs)
        for i, name in enumerate(cam_names):
            if output_directory is not None:
                frame = write_frame(
                    Path(output_directory) / "frames" / name / f"{timestep:06d}.png",
                    imgs[i],
                )
            else:
                frame = to_uint8_frame(imgs[i])
            frames[name].append(frame)

    frames = defaultdict(list)
    mean_losses = []
    enc_prev = encoded_initial
    t_count = config.timestep_count
    for timestep in range(1, t_count + 1):
        cloud, enc_prev = rollout(
            net_params, initial_cloud, encoded_initial, enc_prev, jnp.float32(timestep)
        )
        export_views(cloud, timestep)
        if views_by_timestep is not None:
            mean_losses.append(
                float(eval_mean_image_loss(cloud, views_by_timestep[timestep - 1]))
            )
            if logger is not None:
                logger.log(
                    {"mean-image-loss": mean_losses[-1]},
                    step=config.total_iterations * t_count + timestep,
                )

    # Timestep-0 frame prepended per camera (`train.py:617-627`).
    (imgs0,) = _with_growth(
        lambda: fns["render_all"](initial_cloud, all_w2c, all_K)
    )
    imgs0 = np.asarray(imgs0)
    for i, name in enumerate(cam_names):
        if output_directory is not None:
            frame = write_frame(
                Path(output_directory) / "frames" / name / "000000.png",
                imgs0[i],
            )
        else:
            frame = to_uint8_frame(imgs0[i])
        frames[name].insert(0, frame)
        if output_directory is not None:
            write_video(
                Path(output_directory) / f"{name}.mp4", frames[name], fps=fps
            )
        if logger is not None:
            # wandb.Video per orbit camera (`train.py:630-636`); no-op
            # without an active wandb run.
            logger.log_video(f"{name}-video", frames[name], fps=fps)
    if logger is not None:
        logger.flush()
    return dict(frames), mean_losses
