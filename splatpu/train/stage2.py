"""Stage 2: train the deformation network over an autoregressive timestep
rollout.

TPU-native re-design of reference `train.py:687-806` (SURVEY.md §3.2):

- the timestep loop is inherently serial (step t consumes step t-1's outputs,
  `train.py:759-765`), so the Python loop remains, but each step is ONE jitted
  function: deform -> render V sampled views -> L1+SSIM+rigidity losses ->
  grads (network only) -> Adam + warmup-cosine schedule -> re-encode the
  "previous" state from the *updated* cloud (detached, exactly like the
  reference's recompute-before-backward — there is no BPTT across timesteps);
- rigidity is computed once and multiplied by the view count (the reference
  recomputes an identical value per view and sums, `train.py:395-418`);
- the Gaussian cloud is frozen (`train.py:155-163`) and dense/compacted; the
  foreground index set is static (see splatpu.dynamics.rigidity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import Camera, GaussianCloud, activate_cloud
from splatpu.dynamics.deform import (
    normalize_and_encode_means_and_rotations,
    update_cloud_parameters,
)
from splatpu.dynamics.network import DeformationNetConfig, init_deformation_net
from splatpu.dynamics.rigidity import (
    ForegroundInfo,
    NeighborInfo,
    build_neighbor_info,
    foreground_info,
    rigidity_loss,
)
from splatpu.core.quaternion import quat_normalize
from splatpu.render.api import default_config, render
from splatpu.render.binning import (
    BinningConfig,
    adopt_checkpointed_budget,
    grow_for_span_overflow,
)
from splatpu.core.ssim import ssim
from splatpu.train.losses import L1_WEIGHT, RIGIDITY_WEIGHT, SSIM_WEIGHT
from splatpu.train.optim import make_stage2_optimizer, stage2_lr_at


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    """Mirrors the reference CLI (`train.py:31-42,809-847`)."""

    total_iterations: int = 20
    warmup_iterations: int = 2
    learning_rate: float = 1e-3
    hidden_dim: int = 128
    residual_blocks: int = 3
    views_per_step: int = 5            # `train.py:753`
    timestep_count: int = 10
    renderer: str = "auto"
    binning: Optional[BinningConfig] = None
    binning_overrides: Optional[dict] = None  # individual field overrides over
                                 # the n-scaled default (render.api
                                 # .resolve_binning), used when binning is None
    quirk_compat: bool = True
    compute_dtype: str = "auto"  # "auto" = bfloat16 on TPU, float32 elsewhere
                                 # (stage-2 MLP parity validated: PSNR 22.898
                                 # bf16 vs 22.905 f32, scripts/quality_check.py)
    view_staging: str = "device"  # "device" (f32, reference behavior),
                                  # "device_u8" (4x smaller HBM), or "host"
                                  # (numpy + one-step-ahead async device_put
                                  # of the sampled views; for sequences whose
                                  # full view set exceeds device memory)
    view_batching: str = "vmap"  # "vmap" = one batched render over the sampled
                                 # views (25% faster than "map" on v5e: batched
                                 # sort + batched kernel grids amortize
                                 # per-call overheads); "map" = sequential
    mesh_cameras: int = 0        # > 0: shard the sampled views over a
                                 # `cameras` mesh axis of this many devices
                                 # (shard_map render + psum'd grads,
                                 # splatpu.dist); 0 = single-device.
    # Pair-budget overflow handling (parity with the CUDA binner, which sizes
    # its buffers per frame and never drops a splat — SURVEY.md §2.1 step 2).
    # When `binning` is None the budget is sized from MEASURED demand: one
    # preprocess of the compacted cloud per timestep-0 camera reports the
    # exact pair count, and the budget is demand x binning_headroom
    # (render.api.measure_binning_demand/demand_binning).  At runtime,
    # `binning_overflow` is checked every `overflow_check_every` steps (one
    # scalar fetch); on overflow the budget doubles and the step functions are
    # rebuilt (one recompile), mirroring stage 1.
    grow_budget_on_overflow: bool = True
    overflow_check_every: int = 50
    max_budget_growths: int = 4
    binning_headroom: float = 2.0
    seed: int = 0
    # Mid-run fault tolerance (absent in the reference, SURVEY.md §5.3/§5.4).
    checkpoint_every: int = 0   # in sequence iterations; 0 = disabled
    checkpoint_path: Optional[str] = None
    # Deviation knobs for the deformation head (defaults bit-faithful; see
    # DeformationNetConfig for the measured rationale).
    delta_scale: float = 0.01
    double_residual: bool = True
    zero_init_head: bool = False

    def net_config(self) -> DeformationNetConfig:
        dtype = self.compute_dtype
        if dtype == "auto":
            dtype = (
                "bfloat16" if jax.default_backend() == "tpu" else "float32"
            )
        return DeformationNetConfig(
            hidden_dim=self.hidden_dim,
            residual_blocks=self.residual_blocks,
            compute_dtype=dtype,
            delta_scale=self.delta_scale,
            double_residual=self.double_residual,
            zero_init_head=self.zero_init_head,
        )


def compact_cloud(cloud: GaussianCloud) -> GaussianCloud:
    """Gather alive rows to the front and shrink to the alive count
    (host-side, once, between stages). Stage-2 math then runs dense."""
    alive = np.asarray(cloud.alive)
    idx = np.where(alive)[0]
    params = {k: jnp.asarray(np.asarray(v)[idx]) for k, v in cloud.param_dict().items()}
    return GaussianCloud(alive=jnp.ones((len(idx),), bool), **params)


@dataclasses.dataclass
class Stage2State:
    net_params: dict
    opt_state: tuple
    encoded_previous: jax.Array
    previous_foreground: ForegroundInfo


def setup(
    initial_cloud: GaussianCloud, config: Stage2Config, key=None
):
    """Static setup: foreground indices, neighbor graph, initial encodings."""
    if key is None:
        key = jax.random.key(config.seed)
    cloud = compact_cloud(initial_cloud)
    fg_idx = jnp.asarray(
        np.where(np.asarray(cloud.segmentation_masks)[:, 0] > 0.5)[0], jnp.int32
    )
    neighbor_info = build_neighbor_info(cloud.means[fg_idx])
    encoded_initial = normalize_and_encode_means_and_rotations(
        cloud.means, cloud.rotation_quaternions, quirk_compat=config.quirk_compat
    )
    net_params = init_deformation_net(key, config.net_config())
    optimizer = make_stage2_optimizer(
        config.learning_rate,
        config.warmup_iterations * config.timestep_count,
        config.total_iterations * config.timestep_count,
    )
    opt_state = optimizer.init(net_params)
    return cloud, fg_idx, neighbor_info, encoded_initial, net_params, optimizer, opt_state


def snapshot_previous(cloud: GaussianCloud, fg_idx, neighbor_info: NeighborInfo, quirk_compat=True):
    """`train.py:251-266`: encode current state + foreground snapshot, detached."""
    enc = jax.lax.stop_gradient(
        normalize_and_encode_means_and_rotations(
            cloud.means, cloud.rotation_quaternions, quirk_compat=quirk_compat
        )
    )
    fg = foreground_info(
        cloud.means[fg_idx],
        cloud.rotation_quaternions[fg_idx],
        neighbor_info.indices,
    )
    return enc, fg


def make_train_step(optimizer, config: Stage2Config):
    """Build the jitted stage-2 step.

    All device state — the frozen cloud, encodings, neighbor graph — is passed
    as ARGUMENTS every call, never closed over: on the axon TPU platform,
    closure-captured arrays become embedded constants that are re-marshalled
    on every execution (~30 ms each).
    """
    net_config = config.net_config()
    binning = config.binning

    def step(
        net_params,
        opt_state,
        encoded_previous,
        previous_fg: ForegroundInfo,
        timestep,
        all_w2c,    # (C, 4, 4) — ALL cameras of this timestep, staged once
        all_K,      # (C, 3, 3)
        all_images,  # (C, 3, H, W)
        pick,       # (V,) int32 — this step's sampled views (device gather;
                    # host-side stacking would cost an eager op per step)
        camera_static: Camera,
        initial_cloud: GaussianCloud,
        encoded_initial,
        fg_idx,
        neighbor_info: NeighborInfo,
    ):
        w2c = all_w2c[pick]
        K = all_K[pick]
        images = all_images[pick]
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        def losses(net_params):
            updated = update_cloud_parameters(
                net_params,
                initial_cloud,
                encoded_initial,
                encoded_previous,
                timestep,
                config.timestep_count,
                net_config,
                config.quirk_compat,
            )
            rig = rigidity_loss(
                updated.means[fg_idx],
                updated.rotation_quaternions[fg_idx],
                neighbor_info,
                previous_fg,
            )
            args = activate_cloud(updated)

            def render_one(view):
                vw2c, vK, target = view
                cam = camera_static.replace(w2c=vw2c, K=vK)
                out = render(args, cam, impl=config.renderer, config=binning)
                l1 = jnp.mean(jnp.abs(out.image - target))
                ssim_loss = 1.0 - ssim(out.image, target)
                return l1, ssim_loss, out.overflowed, out.span_overflowed

            if config.view_batching == "vmap":
                # One batched render: binning sorts batch-parallel, the
                # Pallas grid gains a leading view dimension.
                l1s, ssims, overflows, spans = jax.vmap(render_one)(
                    (w2c, K, images)
                )
            else:
                l1s, ssims, overflows, spans = jax.lax.map(
                    render_one, (w2c, K, images)
                )
            l1_sum = jnp.sum(l1s)
            ssim_sum = jnp.sum(ssims)
            image_loss = L1_WEIGHT * l1_sum + SSIM_WEIGHT * ssim_sum
            # The reference sums an identical rigidity value once per sampled
            # view (`train.py:395-418`); the multiplier is the actual count.
            n_views = w2c.shape[0]
            total = image_loss + RIGIDITY_WEIGHT * (n_views * rig)
            aux = {
                "l1": l1_sum,
                "ssim": ssim_sum,
                "image": image_loss,
                "rigidity": n_views * rig,
                "total": total,
                "binning_overflow": jnp.max(overflows.astype(jnp.float32)),
                "span_overflow": jnp.max(spans.astype(jnp.float32)),
                "_updated": updated,
            }
            return total, aux

        grads, aux = jax.grad(losses, has_aux=True)(net_params)
        updated = aux.pop("_updated")
        grad_norm = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
        )
        updates, opt_state = optimizer.update(grads, opt_state, net_params)
        net_params = jax.tree.map(lambda p, u: p + u, net_params, updates)
        enc_prev, prev_fg = snapshot_previous(
            jax.lax.stop_gradient(updated), fg_idx, neighbor_info, config.quirk_compat
        )
        aux["grad_norm"] = grad_norm
        return net_params, opt_state, enc_prev, prev_fg, aux

    from splatpu.core.tpuopts import train_step_compiler_options

    return jax.jit(step, compiler_options=train_step_compiler_options())


def rollout_step(
    net_params,
    initial_cloud: GaussianCloud,
    encoded_initial,
    encoded_previous,
    timestep,
    config: Stage2Config,
):
    """One no-grad deformation step for inference (`train.py:575-585`)."""
    updated = update_cloud_parameters(
        net_params,
        initial_cloud,
        encoded_initial,
        encoded_previous,
        timestep,
        config.timestep_count,
        config.net_config(),
        config.quirk_compat,
    )
    enc_prev = normalize_and_encode_means_and_rotations(
        updated.means, updated.rotation_quaternions, quirk_compat=config.quirk_compat
    )
    return updated, enc_prev


def train(
    initial_cloud: GaussianCloud,
    views_by_timestep,     # list[T] of list[ViewData] (timesteps 1..T)
    config: Stage2Config,
    logger=None,
    progress: bool = False,
    resume_from=None,
    on_iteration=None,
):
    """Full stage-2 training loop (`train.py:728-776`).

    `on_iteration(seq_it, net_params, resolved_config, last_metrics)` fires
    after every sequence iteration — acceptance harnesses use it to write
    incremental results / mid-run rollout evals so a killed run still leaves
    evidence (absent in the reference; a crash there loses everything but the
    wandb stream, SURVEY.md §5.3)."""
    from splatpu.io.checkpoint import load_checkpoint, save_checkpoint

    initial_cloud = compact_cloud(initial_cloud)
    v0 = views_by_timestep[0][0]
    camera_static = Camera(
        w2c=jnp.asarray(v0.w2c), K=jnp.asarray(v0.K), width=v0.width, height=v0.height
    )
    if config.binning is None:
        # Size the pair budget from MEASURED demand over the timestep-0
        # cameras, not guessed from capacity: the round-2 acceptance run
        # trained 3,500 steps with every render silently truncated because
        # the capacity heuristic undershot at 720p.  CLI field overrides
        # still apply on top.
        from splatpu.render.api import demand_binning, measure_binning_demand

        t0_views = views_by_timestep[0]
        d_pairs, d_span = measure_binning_demand(
            activate_cloud(initial_cloud),
            camera_static,
            np.stack([v.w2c for v in t0_views]),
            np.stack([v.K for v in t0_views]),
        )
        config = dataclasses.replace(
            config,
            binning=demand_binning(
                d_pairs,
                d_span,
                headroom=config.binning_headroom,
                overrides=config.binning_overrides,
            ),
        )
    (
        cloud,
        fg_idx,
        neighbor_info,
        encoded_initial,
        net_params,
        optimizer,
        opt_state,
    ) = setup(initial_cloud, config)

    # Distributed option (new vs the single-GPU reference, `train.py:702`):
    # shard the sampled views over a `cameras` mesh axis; the deformation
    # network stays replicated and its grads arrive psum'd.
    distributed = config.mesh_cameras > 0

    def build_step(cfg):
        if distributed:
            from splatpu.dist.mesh import get_mesh
            from splatpu.dist.train_step import make_sharded_train_step

            mesh = get_mesh(camera_axis=cfg.mesh_cameras, tile_axis=1)
            return make_sharded_train_step(optimizer, cfg, mesh, camera_static)
        return make_train_step(optimizer, cfg)

    step_fn = build_step(config)
    # View staging (reference preloads everything to the GPU as f32,
    # `train.py:207-217` — which cannot scale to 150 timesteps x 27 cameras
    # at 720p on a 16 GB chip):
    #   "device"     f32 on device (reference behavior; fastest per step)
    #   "device_u8"  uint8 on device (4x smaller; images come from 8-bit
    #                files, so round-tripping is exact; converted in-jit)
    #   "host"       numpy on host; each step's sampled views are staged with
    #                an async device_put one step AHEAD (overlaps H2D with
    #                the previous step's compute)
    def stage_images(views):
        imgs = np.stack([v.image for v in views])
        if config.view_staging == "device":
            return jnp.asarray(imgs)
        if config.view_staging == "device_u8":
            return jnp.asarray(
                np.clip(np.rint(imgs * 255.0), 0, 255).astype(np.uint8)
            )
        return imgs  # host

    staged = [
        (
            jnp.asarray(np.stack([v.w2c for v in views])),
            jnp.asarray(np.stack([v.K for v in views])),
            stage_images(views),
        )
        for views in views_by_timestep
    ]

    rng = np.random.default_rng(config.seed)
    t_count = config.timestep_count
    start_it = 0
    growths = 0
    if resume_from is not None:
        template = {
            "net_params": net_params,
            "opt_state": opt_state,
            "seq_it": jnp.int32(0),
            "max_pairs": jnp.int32(config.binning.max_pairs),
            "max_span": jnp.int32(config.binning.max_span),
            "growths": jnp.int32(0),
        }
        try:
            restored = load_checkpoint(resume_from, template)
        except (KeyError, ValueError):
            # Pre-growth checkpoint format (round 2): no budget fields.
            old = {k: template[k] for k in ("net_params", "opt_state", "seq_it")}
            restored = dict(template, **load_checkpoint(resume_from, old))
        net_params = restored["net_params"]
        opt_state = restored["opt_state"]
        start_it = int(restored["seq_it"]) + 1
        rng = np.random.default_rng(config.seed + start_it)
        # Adopt a checkpointed auto-grown pair budget (stage-1 semantics:
        # without this a resumed run reverts to the setup-time budget and
        # silently drops splats until overflow is re-detected).
        growths = int(restored["growths"])
        adopted, rebuilt = adopt_checkpointed_budget(
            config.binning,
            int(restored["max_pairs"]),
            int(restored["max_span"]),
            int(cloud.capacity),
        )
        if rebuilt:
            config = dataclasses.replace(config, binning=adopted)
            step_fn = build_step(config)
    outer = range(start_it, config.total_iterations)
    if progress:
        import tqdm

        # total= explicitly: tqdm would otherwise infer len(range) and show
        # a resumed run as instantly 100%.
        outer = tqdm.tqdm(
            outer, desc="stage2", initial=start_it,
            total=config.total_iterations,
        )
    metrics = {}
    for seq_it in outer:
        enc_prev, prev_fg = snapshot_previous(
            cloud, fg_idx, neighbor_info, config.quirk_compat
        )
        # Without-replacement samples like `train.py:753` (clamped so small
        # synthetic scenes with fewer cameras than views_per_step work);
        # drawn for the whole sequence iteration up front so host staging can
        # prefetch one step ahead.  Each timestep samples from ITS own camera
        # count (timesteps may have unequal counts, e.g. dropped frames); the
        # sample size is the minimum count so every step renders V views.
        v = min(config.views_per_step, min(s[0].shape[0] for s in staged))
        picks = [
            rng.choice(staged[t][0].shape[0], size=v, replace=False).astype(np.int32)
            for t in range(t_count)
        ]
        host = config.view_staging == "host"
        if host:
            prefetched = jax.device_put(staged[0][2][picks[0]])
        for timestep in range(1, t_count + 1):
            step_idx = seq_it * t_count + timestep
            all_w2c, all_K, all_images = staged[timestep - 1]
            pick = picks[timestep - 1]
            if host:
                images_arg = prefetched
                if timestep < t_count:
                    prefetched = jax.device_put(
                        staged[timestep][2][picks[timestep]]
                    )
                pick_arg = np.arange(v, dtype=np.int32)
                w2c_arg = all_w2c[jnp.asarray(pick)]
                k_arg = all_K[jnp.asarray(pick)]
            else:
                images_arg, pick_arg, w2c_arg, k_arg = (
                    all_images, pick, all_w2c, all_K
                )
            if distributed:
                # The view sample rarely divides a TPU mesh axis; padding
                # picks carry weight 0 (splatpu.dist.sharding.pad_picks).
                from splatpu.dist.sharding import pad_picks

                pick_arg, weights = pad_picks(
                    jnp.asarray(pick_arg, jnp.int32), config.mesh_cameras
                )
                extra = (pick_arg, weights)
            else:
                extra = (pick_arg, camera_static)
            net_params, opt_state, enc_prev, prev_fg, metrics = step_fn(
                net_params,
                opt_state,
                enc_prev,
                prev_fg,
                np.float32(timestep),
                w2c_arg,
                k_arg,
                images_arg,
                *extra,
                cloud,
                encoded_initial,
                fg_idx,
                neighbor_info,
            )
            if logger is not None:
                # Per-step learning rate (`train.py:758`); computed host-side
                # from the schedule — the optimizer has already consumed
                # (step_idx - 1) updates when this step's update applies.
                metrics = dict(
                    metrics,
                    learning_rate=stage2_lr_at(
                        config.learning_rate,
                        config.warmup_iterations * t_count,
                        config.total_iterations * t_count,
                        step_idx - 1,
                    ),
                )
                logger.log(metrics, step=step_idx)
            if (
                config.grow_budget_on_overflow
                and config.overflow_check_every
                and step_idx % config.overflow_check_every == 0
                and float(metrics.get("binning_overflow", 0.0)) > 0.0
            ):
                if growths < config.max_budget_growths:
                    # Grow the budget that actually overflowed (span vs
                    # pairs): doubling the pair budget for a span overflow
                    # cannot clear it and halves render throughput.
                    if float(metrics.get("span_overflow", 0.0)) > 0.0:
                        grown = grow_for_span_overflow(
                            config.binning, int(cloud.capacity)
                        )
                    else:
                        grown = dataclasses.replace(
                            config.binning,
                            max_pairs=min(
                                config.binning.max_pairs * 2, 1 << 24
                            ),
                        )
                    config = dataclasses.replace(config, binning=grown)
                    step_fn = build_step(config)
                    growths += 1
                    if logger is not None:
                        logger.log(
                            {
                                "budget_growth": growths,
                                "max_pairs": grown.max_pairs,
                                "max_span": grown.max_span,
                            },
                            step=step_idx,
                        )
                else:
                    import warnings

                    warnings.warn(
                        "stage 2: binning pair budget still overflowing at "
                        f"max_pairs={config.binning.max_pairs} after "
                        f"{growths} growths — renders are dropping splats "
                        "(raise binning_overrides or max_budget_growths)",
                        stacklevel=2,
                    )
        if (
            config.checkpoint_every
            and config.checkpoint_path
            and (seq_it + 1) % config.checkpoint_every == 0
        ):
            save_checkpoint(
                config.checkpoint_path,
                {
                    "net_params": net_params,
                    "opt_state": opt_state,
                    "seq_it": jnp.int32(seq_it),
                    "max_pairs": jnp.int32(config.binning.max_pairs),
                    "max_span": jnp.int32(config.binning.max_span),
                    "growths": jnp.int32(growths),
                },
            )
        if on_iteration is not None:
            # A truthy return requests a clean early stop (after this
            # iteration's checkpoint write above) — long host-staged runs on
            # the axon tunnel are chunked across process restarts because
            # the tunnel client retains every device_put'd host buffer
            # (measured +13.8 MB per put, unbounded; round-4 OOM
            # post-mortem in NOTES_R5.md).
            if on_iteration(seq_it, net_params, config, metrics):
                break
    if logger is not None:
        logger.flush()
    return net_params, cloud, encoded_initial, metrics
