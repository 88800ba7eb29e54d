"""Stage 1: fit a static Gaussian cloud to timestep 0, with densification.

TPU-native re-design of `densify.py` (reference flow at SURVEY.md §3.1):

- the cloud is fixed-capacity (see `splatpu.growth`); the Python loop stays on
  the host but each iteration is ONE jitted step: render image + segmentation,
  L1+SSIM losses, gradients, Adam update, densification-stat accumulation —
  no per-step host sync (metrics are fetched asynchronously);
- mutation iterations run a second jitted function (`densify_and_prune` +
  optional opacity reset).  The reference skips the Adam update on mutation
  iterations as a side effect of re-registering parameters (torch leaves
  `.grad = None` on the new tensors) — we reproduce that explicitly;
- the view schedule is the reference's without-replacement random buffer
  (`densify.py:108-111,217-221`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.core.types import Camera, GaussianCloud, activate_cloud, cloud_from_arrays
from splatpu.growth.densify import (
    DensifyConfig,
    DensifyStats,
    accumulate_stats,
    accumulate_stats_batch,
    densify_and_prune,
    init_stats,
    reset_opacity,
)
from splatpu.neighbors.knn import knn
from splatpu.render.api import default_config, render, render_dual
from splatpu.render.binning import (
    BinningConfig,
    adopt_checkpointed_budget,
    grow_for_span_overflow,
)
from splatpu.train.losses import SEGMENTATION_WEIGHT, image_loss
from splatpu.train.optim import (
    apply_stage1_updates,
    make_stage1_adam,
    stage1_learning_rates,
)


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    iterations: int = 30_000                  # `densify.py:218`
    capacity_factor: float = 4.0              # cloud capacity / initial N
    densify: DensifyConfig = DensifyConfig()
    renderer: str = "auto"
    binning: Optional[BinningConfig] = None
    binning_overrides: Optional[dict] = None  # individual field overrides,
                          # applied on top of the n-scaled default heuristic
                          # when `binning` is None (render.api.resolve_binning)
    mesh_tiles: int = 0   # > 0: shard each render into this many image strips
                          # over a `tiles` mesh axis (stage 1 renders ONE
                          # camera per iteration, so tiles are the axis that
                          # parallelizes; splatpu.dist.tile_sharding).
    views_per_step: int = 1
                          # > 1: render this many sampled cameras per
                          # iteration in ONE jitted step (vmap-batched dual
                          # renders sharing the activated cloud).  The loss is
                          # the per-view MEAN (parameter-gradient scale stays
                          # comparable to the reference's single view), while
                          # the densification statistics accumulate each view
                          # independently at reference magnitude — one k-view
                          # iteration advances the stats like k reference
                          # iterations.  TPU rationale: amortizes the fixed
                          # per-execution dispatch and the cloud activation
                          # over views, and k-samples the view set per step.
    # Pair-budget overflow handling: the binning pair budget is static
    # (shape-defining).  When a step reports `binning_overflow`, the budget is
    # doubled and the step functions are rebuilt (one recompile) — an
    # overflowing scene trains without code edits instead of silently
    # dropping splats.  Checked every `overflow_check_every` iterations (each
    # check is one scalar fetch).
    grow_budget_on_overflow: bool = True
    overflow_check_every: int = 100
    max_budget_growths: int = 4
    seed: int = 0
    # Mid-run fault tolerance (absent in the reference, SURVEY.md §5.3/§5.4):
    # every N iterations the full (cloud, optimizer, stats, rng, i) state is
    # written; `fit(resume_from=...)` restarts from it.
    checkpoint_every: int = 0                 # 0 = disabled
    checkpoint_path: Optional[str] = None


def initialize_cloud(point_cloud: np.ndarray, capacity: int) -> GaussianCloud:
    """`densify.py:22-57`: means/colors from the point cloud, seg -> (fg,0,bg),
    identity quats, opacity logits 0 (sigmoid -> 0.5), isotropic log scales =
    log(sqrt(mean squared distance to 3 nearest neighbors))."""
    xyz = jnp.asarray(point_cloud[:, :3])
    _, d2 = knn(xyz, k=3)
    mean_d2 = jnp.clip(jnp.mean(d2, axis=-1), 1e-7, None)
    log_scales = jnp.tile(jnp.log(jnp.sqrt(mean_d2))[:, None], (1, 3))
    seg = point_cloud[:, 6]
    n = point_cloud.shape[0]
    return cloud_from_arrays(
        means=point_cloud[:, :3],
        colors=point_cloud[:, 3:6],
        segmentation_masks=np.stack([seg, np.zeros_like(seg), 1.0 - seg], -1),
        rotation_quaternions=np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1)),
        opacity_logits=np.zeros((n, 1), np.float32),
        log_scales=log_scales,
        capacity=capacity,
    )


def make_step_fns(camera_static: Camera, config: Stage1Config, scene_radius: float):
    """Build the two jitted step functions. `camera_static` provides the
    static (width/height) fields; per-view (w2c, K) tensors are step inputs."""
    binning = config.binning or None
    lrs = stage1_learning_rates(scene_radius)
    adam = make_stage1_adam()

    sharded_dual = None
    if config.mesh_tiles > 0:
        from splatpu.dist.mesh import get_mesh
        from splatpu.dist.tile_sharding import make_tile_sharded_render_dual

        mesh = get_mesh(camera_axis=1, tile_axis=config.mesh_tiles)
        sharded_dual = make_tile_sharded_render_dual(
            mesh, camera_static, renderer=config.renderer, binning=binning
        )

    def loss_fn(params, offset, alive, w2c, K, image, seg_target):
        cloud = GaussianCloud(alive=alive, **params)
        camera = camera_static.replace(w2c=w2c, K=K)
        args = activate_cloud(cloud).replace(means2d_offset=offset)
        # One shared preprocess+binning, two composites (image + segmentation);
        # only the image pass feeds the densification gradient collector
        # (`densify.py:130-132`).
        if sharded_dual is not None:
            img_a, img_b, radii, overflow, span_overflow = sharded_dual(
                args, cloud.segmentation_masks, w2c, K
            )
            h, w = camera_static.height, camera_static.width
            img_a, img_b = img_a[:, :h, :w], img_b[:, :h, :w]
        else:
            out, seg_out = render_dual(
                args,
                cloud.segmentation_masks,
                camera,
                impl=config.renderer,
                config=binning,
            )
            img_a, img_b, radii = out.image, seg_out.image, out.radii
            overflow = (out.overflowed | seg_out.overflowed).astype(jnp.float32)
            span_overflow = (
                out.span_overflowed | seg_out.span_overflowed
            ).astype(jnp.float32)
        img_loss = image_loss(img_a, image)
        seg_loss = image_loss(img_b, seg_target)
        total = img_loss + SEGMENTATION_WEIGHT * seg_loss
        aux = {
            "radii": radii,
            "image_loss": img_loss,
            "segmentation_loss": seg_loss,
            "total_loss": total,
            # Binning budget exceeded this view (splats dropped) — surfaces in
            # the metrics stream so silent quality loss is visible.  The span
            # flag is separate: growth must raise the budget that overflowed
            # (a span cascade once needlessly 4x'd the pair budget).
            "binning_overflow": overflow,
            "span_overflow": span_overflow,
        }
        return total, aux

    grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)

    V = config.views_per_step
    if V > 1 and config.mesh_tiles > 0:
        raise ValueError(
            "views_per_step > 1 cannot be combined with mesh_tiles (batch the"
            " views OR shard one view's tiles)"
        )

    def loss_fn_batch(params, offsets, alive, w2cs, Ks, images, seg_targets):
        """V-view step: one shared cloud activation, vmapped dual renders.
        Each view gets its OWN means2d collector slice so the densification
        statistics see per-view screen gradients (matching V reference
        iterations), not their sum."""
        cloud = GaussianCloud(alive=alive, **params)
        base_args = activate_cloud(cloud)

        def one(offset, w2c, K, image, seg_target):
            camera = camera_static.replace(w2c=w2c, K=K)
            args = base_args.replace(means2d_offset=offset)
            out, seg_out = render_dual(
                args,
                cloud.segmentation_masks,
                camera,
                impl=config.renderer,
                config=binning,
            )
            img_loss = image_loss(out.image, image)
            seg_loss = image_loss(seg_out.image, seg_target)
            total = img_loss + SEGMENTATION_WEIGHT * seg_loss
            overflow = (out.overflowed | seg_out.overflowed).astype(jnp.float32)
            span = (out.span_overflowed | seg_out.span_overflowed).astype(
                jnp.float32
            )
            return total, (out.radii, img_loss, seg_loss, overflow, span)

        totals, (radii, img_l, seg_l, ovf, span) = jax.vmap(one)(
            offsets, w2cs, Ks, images, seg_targets
        )
        total = jnp.mean(totals)
        aux = {
            "radii": radii,  # (V, CAP)
            "image_loss": jnp.mean(img_l),
            "segmentation_loss": jnp.mean(seg_l),
            "total_loss": total,
            "binning_overflow": jnp.max(ovf),
            "span_overflow": jnp.max(span),
        }
        return total, aux

    grad_fn_batch = jax.grad(loss_fn_batch, argnums=(0, 1), has_aux=True)

    def _compute(cloud, stats, w2c, K, image, seg_target):
        if V > 1:
            params = cloud.param_dict()
            offsets = jnp.zeros((V, cloud.capacity, 2), jnp.float32)
            (param_grads, offset_grads), aux = grad_fn_batch(
                params, offsets, cloud.alive, w2c, K, image, seg_target
            )
            # The mean loss scales every gradient by 1/V; the reference's
            # densification thresholds are calibrated on per-view magnitudes,
            # so undo the scaling on the screen-space collector only.
            stats = accumulate_stats_batch(stats, offset_grads * V, aux["radii"])
            return param_grads, stats, aux
        params = cloud.param_dict()
        offset = jnp.zeros((cloud.capacity, 2), jnp.float32)
        (param_grads, offset_grad), aux = grad_fn(
            params, offset, cloud.alive, w2c, K, image, seg_target
        )
        stats = accumulate_stats(stats, offset_grad, aux["radii"])
        return param_grads, stats, aux

    def train_step(cloud, opt_state, stats, w2c, K, image, seg_target, accumulate):
        """Non-mutation iteration: grads + Adam update (+ stat accumulation
        while in the densification window)."""
        param_grads, new_stats, aux = _compute(
            cloud, stats, w2c, K, image, seg_target
        )
        stats = jax.tree.map(
            lambda new, old: jnp.where(accumulate, new, old), new_stats, stats
        )
        updates, opt_state = adam.update(param_grads, opt_state)
        params = apply_stage1_updates(cloud.param_dict(), updates, lrs)
        # Dead slots must not drift.
        params = {
            k: jnp.where(
                cloud.alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, getattr(cloud, k)
            )
            for k, v in params.items()
        }
        cloud = cloud.replace(**params)
        metrics = {
            k: aux[k]
            for k in (
                "image_loss", "segmentation_loss", "total_loss",
                "binning_overflow", "span_overflow",
            )
        }
        metrics["n_alive"] = cloud.n_alive()
        return cloud, opt_state, stats, metrics

    def mutate_step(cloud, opt_state, stats, w2c, K, image, seg_target, key, i, do_reset):
        """Mutation iteration: grads feed the stats, then clone/split/prune
        (+ optional opacity reset). No Adam update (reference behavior — the
        re-registered torch params have grad None when optimizer.step runs)."""
        _param_grads, stats, aux = _compute(cloud, stats, w2c, K, image, seg_target)
        cloud, opt_state, stats, info = densify_and_prune(
            cloud, opt_state, stats, key, i, scene_radius, config.densify
        )
        cloud, opt_state = jax.lax.cond(
            do_reset,
            lambda c, s: reset_opacity(c, s, config.densify),
            lambda c, s: (c, s),
            cloud,
            opt_state,
        )
        metrics = {
            k: aux[k]
            for k in (
                "image_loss", "segmentation_loss", "total_loss",
                "binning_overflow", "span_overflow",
            )
        }
        metrics.update({k: v for k, v in info.items()})
        return cloud, opt_state, stats, metrics

    from splatpu.core.tpuopts import train_step_compiler_options

    opts = train_step_compiler_options()
    if V > 1:
        # Multi-view steps take the FULL staged view set + this step's picks;
        # the (V,)-gather runs in-jit (a host-side stack would cost an eager
        # tunnel round-trip per step).
        def train_step_v(
            cloud, opt_state, stats, all_w2c, all_K, all_images, all_segs,
            pick, accumulate,
        ):
            return train_step(
                cloud, opt_state, stats, all_w2c[pick], all_K[pick],
                all_images[pick], all_segs[pick], accumulate,
            )

        def mutate_step_v(
            cloud, opt_state, stats, all_w2c, all_K, all_images, all_segs,
            pick, key, i, do_reset,
        ):
            return mutate_step(
                cloud, opt_state, stats, all_w2c[pick], all_K[pick],
                all_images[pick], all_segs[pick], key, i, do_reset,
            )

        return jax.jit(train_step_v, compiler_options=opts), jax.jit(
            mutate_step_v, compiler_options=opts
        ), adam
    return jax.jit(train_step, compiler_options=opts), jax.jit(
        mutate_step, compiler_options=opts
    ), adam


def fit(
    point_cloud: np.ndarray,
    views: list,
    scene_radius: float,
    config: Stage1Config = Stage1Config(),
    logger=None,
    progress: bool = False,
    resume_from=None,
    on_iteration=None,
    on_iteration_every: int = 1000,
):
    """Run the full stage-1 fit; `views` is a list of objects with
    (w2c, K, width, height, image, segmentation) — see data.dataset.ViewData.

    `on_iteration(i, cloud, last_metrics)` fires every `on_iteration_every`
    iterations — harnesses write incremental results from it so an
    interrupted run still leaves evidence (stage-2 parity).

    Returns (cloud, metrics_history_last).
    """
    from splatpu.io.checkpoint import load_checkpoint, save_checkpoint

    capacity = int(point_cloud.shape[0] * config.capacity_factor)
    capacity = -(-capacity // 256) * 256
    # Resolve the binning config ONCE, with the capacity-scaled heuristic as
    # the base for any CLI field overrides; everything downstream (step fns,
    # budget growth, checkpoints) sees an explicit config.
    from splatpu.render.api import resolve_binning

    config = dataclasses.replace(
        config,
        binning=resolve_binning(
            capacity, config.binning, config.binning_overrides
        ),
    )
    cloud = initialize_cloud(point_cloud, capacity)
    v0 = views[0]
    camera_static = Camera(
        w2c=jnp.asarray(v0.w2c),
        K=jnp.asarray(v0.K),
        width=v0.width,
        height=v0.height,
    )
    train_step, mutate_step, adam = make_step_fns(camera_static, config, scene_radius)
    opt_state = adam.init(cloud.param_dict())
    stats = init_stats(capacity)

    # Device-stage the views once (timestep 0 only, like `densify.py:212-216`).
    V = config.views_per_step
    if V > 1:
        staged = (
            jnp.asarray(np.stack([v.w2c for v in views])),
            jnp.asarray(np.stack([v.K for v in views])),
            jnp.asarray(np.stack([v.image for v in views])),
            jnp.asarray(np.stack([v.segmentation for v in views])),
        )
        dev_views = None
    else:
        dev_views = [
            (
                jnp.asarray(v.w2c),
                jnp.asarray(v.K),
                jnp.asarray(v.image),
                jnp.asarray(v.segmentation),
            )
            for v in views
        ]

    rng = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)  # raw key: msgpack-serializable
    start_iter = 0
    resumed_growths = 0
    if resume_from is not None:
        template = {
            "cloud": cloud,
            "opt_state": opt_state,
            "stats": stats,
            "key": key,
            "i": jnp.int32(0),
            "max_pairs": jnp.int32(config.binning.max_pairs),
            "max_span": jnp.int32(config.binning.max_span),
            "growths": jnp.int32(0),
        }
        try:
            restored = load_checkpoint(resume_from, template)
        except (KeyError, ValueError):
            # Pre-budget-field checkpoint format: resume state without the
            # grown budget (pass binning_overrides to restore it manually,
            # else grow-on-overflow re-detects it at the cost of recompiles).
            old = {
                k: template[k]
                for k in ("cloud", "opt_state", "stats", "key", "i")
            }
            restored = dict(template, **load_checkpoint(resume_from, old))
        cloud = restored["cloud"]
        opt_state = restored["opt_state"]
        stats = restored["stats"]
        key = restored["key"]
        start_iter = int(restored["i"]) + 1
        rng = np.random.default_rng(config.seed + start_iter)
        # Adopt a checkpointed auto-grown pair budget: without this, a
        # resumed run reverts to the initial budget and silently drops
        # splats (re-paying every growth recompile) until overflow is
        # re-detected.
        resumed_growths = int(restored["growths"])
        adopted, rebuilt = adopt_checkpointed_budget(
            config.binning,
            int(restored["max_pairs"]),
            int(restored["max_span"]),
            int(cloud.means.shape[0]),
        )
        if rebuilt:
            config = dataclasses.replace(config, binning=adopted)
            train_step, mutate_step, adam = make_step_fns(
                camera_static, config, scene_radius
            )

    buffer: list[int] = []
    dcfg = config.densify
    iterator = range(start_iter, config.iterations)
    if progress:
        import tqdm

        iterator = tqdm.tqdm(iterator, desc="stage1", initial=start_iter)
    metrics = {}
    growths = resumed_growths
    n_views = len(views)
    for i in iterator:
        if V > 1:
            # Pop V views from the without-replacement buffer (refilling as
            # it drains) — the epoch structure of `densify.py:108-111` at V
            # views per iteration.
            sel = []
            while len(sel) < V:
                if not buffer:
                    buffer = list(rng.permutation(n_views))
                sel.append(buffer.pop())
            pick = jnp.asarray(np.asarray(sel, np.int32))
        else:
            if not buffer:
                buffer = list(rng.permutation(n_views))
            w2c, K, image, seg = dev_views[buffer.pop()]
        if (
            config.grow_budget_on_overflow
            and growths < config.max_budget_growths
            and i > start_iter
            and i % config.overflow_check_every == 0
            and float(metrics.get("binning_overflow", 0.0)) > 0.0
        ):
            # Grow the budget that actually overflowed: one over-wide
            # Gaussian must raise max_span, not double the
            # (throughput-defining) pair buffer.  If BOTH overflowed, the
            # union flag persists and the next check grows the other.
            if float(metrics.get("span_overflow", 0.0)) > 0.0:
                grown = grow_for_span_overflow(
                    config.binning, int(cloud.means.shape[0])
                )
            else:
                grown = dataclasses.replace(
                    config.binning,
                    max_pairs=min(config.binning.max_pairs * 2, 1 << 24),
                )
            config = dataclasses.replace(config, binning=grown)
            train_step, mutate_step, adam = make_step_fns(
                camera_static, config, scene_radius
            )
            growths += 1
            if logger is not None:
                logger.log(
                    {
                        "budget_growth": growths,
                        "max_pairs": grown.max_pairs,
                        "max_span": grown.max_span,
                    },
                    step=i,
                )
        if dcfg.is_mutation_iter(i):
            key, sub = jax.random.split(key)
            if V > 1:
                cloud, opt_state, stats, metrics = mutate_step(
                    cloud, opt_state, stats, *staged, pick,
                    sub, jnp.int32(i), dcfg.is_opacity_reset_iter(i),
                )
            else:
                cloud, opt_state, stats, metrics = mutate_step(
                    cloud,
                    opt_state,
                    stats,
                    w2c,
                    K,
                    image,
                    seg,
                    sub,
                    jnp.int32(i),
                    dcfg.is_opacity_reset_iter(i),
                )
        else:
            accumulate = i <= dcfg.window_end
            if V > 1:
                cloud, opt_state, stats, metrics = train_step(
                    cloud, opt_state, stats, *staged, pick, accumulate
                )
            else:
                cloud, opt_state, stats, metrics = train_step(
                    cloud, opt_state, stats, w2c, K, image, seg, accumulate
                )
        if logger is not None:
            logger.log(metrics, step=i)
        if on_iteration is not None and (i + 1) % on_iteration_every == 0:
            on_iteration(i, cloud, metrics)
        if (
            config.checkpoint_every
            and config.checkpoint_path
            and (i + 1) % config.checkpoint_every == 0
        ):
            save_checkpoint(
                config.checkpoint_path,
                {
                    "cloud": cloud,
                    "opt_state": opt_state,
                    "stats": stats,
                    "key": key,
                    "i": jnp.int32(i),
                    "max_pairs": jnp.int32(config.binning.max_pairs),
                    "max_span": jnp.int32(config.binning.max_span),
                    "growths": jnp.int32(growths),
                },
            )
    if logger is not None:
        logger.flush()
    return cloud, metrics
