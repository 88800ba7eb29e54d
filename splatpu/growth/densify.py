"""Fixed-capacity, jit-safe densification: clone / split / prune / opacity-reset.

Functional re-design of the reference's densification engine
(`external.py:113-314` + `densify.py:89-105,154-162`), which grows/shrinks
torch tensors and surgically rewrites Adam's ``exp_avg``/``exp_avg_sq``
in-place.  Dynamic shapes would force XLA recompiles, so here:

- the cloud lives in a **static-capacity** SoA with an ``alive`` mask;
- *prune* clears mask bits (moments of dead slots are left stale — they are
  re-zeroed when a slot is reused, which matches the reference's semantics of
  fresh zero moments for newly created Gaussians);
- *clone* scatters copies of selected rows into dead slots (zero moments at
  the destination, like `cat_params_to_optimizer`'s zero-padding,
  `external.py:145-170`);
- *split* writes one child **over the original slot** and one into a dead
  slot — algebraically identical to the reference's "append n=2 children then
  remove the original" (`external.py:244-287`), with zeroed moments for both;
- *opacity reset* rewrites logits to ``inverse_sigmoid(0.01)`` and zeroes the
  **entire** opacity moment buffers (`external.py:127-142,306-314`).

Selection rules, thresholds, and cadence match `external.py:211-314`:
clone if avg‖∇means2D‖ >= 2e-4 and max scale <= 0.01*scene_radius; split if
the gradient test passes and max scale > 0.01*scene_radius (children scales
/= 1.6, means jittered by N(0, scale) rotated into world frame); prune if
opacity < 0.005 (0.25 on the final window iteration) or, after iteration
3000, max world-space scale > 0.1*scene_radius.

All functions are pure; everything jits with static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from splatpu.core.quaternion import build_rotation
from splatpu.core.types import GaussianCloud


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """All reference constants, surfaced (SURVEY.md §5.6)."""

    window_end: int = 5000          # stats accumulate & mutate while i <= this
    mutate_start: int = 500         # first mutation iteration
    mutate_every: int = 100
    grad_threshold: float = 2e-4
    clone_scale_factor: float = 0.01     # * scene_radius
    split_children: int = 2
    split_scale_shrink: float = 0.8      # children scales /= (shrink * children)
    prune_opacity: float = 0.005
    prune_opacity_final: float = 0.25
    prune_big_start: int = 3000
    prune_big_scale: float = 0.1         # * scene_radius
    opacity_reset_every: int = 3000
    opacity_reset_value: float = 0.01

    def is_mutation_iter(self, i: int) -> bool:
        return (
            i <= self.window_end
            and i >= self.mutate_start
            and i % self.mutate_every == 0
        )

    def is_opacity_reset_iter(self, i: int) -> bool:
        return i > 0 and i % self.opacity_reset_every == 0


@struct.dataclass
class DensifyStats:
    """Per-slot screen-space statistics (`shared.py:20-26`, `densify.py:89-105`)."""

    grad_accum: jax.Array   # (CAP,) accumulated ||d(means2d_ndc)||
    vis_count: jax.Array    # (CAP,)
    max_radii: jax.Array    # (CAP,)


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(grad_accum=z, vis_count=z, max_radii=z)


def accumulate_stats(
    stats: DensifyStats, means2d_grad: jax.Array, radii: jax.Array
) -> DensifyStats:
    """`external.py:113-124` + `densify.py:154-162`: visibility = radii > 0;
    accumulate the xy screen-gradient norm and bump max radii."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(visible, gnorm, 0.0),
        vis_count=stats.vis_count + visible.astype(jnp.float32),
        max_radii=jnp.where(visible, jnp.maximum(stats.max_radii, radii), stats.max_radii),
    )


def accumulate_stats_batch(
    stats: DensifyStats, means2d_grads: jax.Array, radii: jax.Array
) -> DensifyStats:
    """Multi-view stage-1 step: accumulate V views' screen statistics in one
    update.  Equivalent to V sequential `accumulate_stats` calls (the per-view
    contributions are independent sums / a max), so a k-view step advances the
    densification statistics exactly as k reference iterations would
    (`external.py:113-124`).  `means2d_grads` is (V, CAP, 2), `radii` (V, CAP).
    """
    visible = radii > 0
    gnorm = jnp.linalg.norm(means2d_grads[..., :2], axis=-1)
    rmax = jnp.max(jnp.where(visible, radii, 0.0), axis=0)
    return DensifyStats(
        grad_accum=stats.grad_accum
        + jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0),
        vis_count=stats.vis_count + jnp.sum(visible.astype(jnp.float32), axis=0),
        # max with 0 is a no-op where no view saw the splat (max_radii >= 0).
        max_radii=jnp.maximum(stats.max_radii, rmax),
    )


def _zero_moments_at(adam_state, mask):
    """Zero mu/nu rows where mask is True, for every cloud parameter leaf."""
    def z(leaf):
        m = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, 0.0, leaf)

    return adam_state._replace(
        mu=jax.tree.map(z, adam_state.mu), nu=jax.tree.map(z, adam_state.nu)
    )


def _scatter_rows(tree, src_mask_rank, dest_idx, src_tree=None):
    """For each row g with rank r = src_mask_rank[g] >= 0, write row values
    (from src_tree or tree) into dest_idx[r]; OOB dests are dropped."""
    cap = dest_idx.shape[0]
    src = src_tree if src_tree is not None else tree

    def scat(leaf, src_leaf):
        dests = jnp.where(
            src_mask_rank >= 0,
            dest_idx[jnp.clip(src_mask_rank, 0, cap - 1)],
            leaf.shape[0] + 1,  # dropped
        )
        return leaf.at[dests].set(src_leaf, mode="drop")

    return jax.tree.map(scat, tree, src)


def densify_and_prune(
    cloud: GaussianCloud,
    adam_state,
    stats: DensifyStats,
    key,
    i: jax.Array | int,
    scene_radius,
    config: DensifyConfig = DensifyConfig(),
):
    """One mutation step (call only on schedule iterations; see
    `DensifyConfig.is_mutation_iter`).  Returns (cloud, adam_state, stats,
    info) where info carries counts for observability.

    ``is_final`` (i == window_end) selects the aggressive opacity prune
    threshold, matching `external.py:289`.
    """
    cap = cloud.capacity
    alive = cloud.alive

    avg_grad = stats.grad_accum / stats.vis_count
    avg_grad = jnp.where(jnp.isnan(avg_grad), 0.0, avg_grad)

    scales = jnp.exp(cloud.log_scales)
    max_scale = jnp.max(scales, axis=1)
    scale_threshold = config.clone_scale_factor * scene_radius

    grad_hot = avg_grad >= config.grad_threshold
    to_clone = alive & grad_hot & (max_scale <= scale_threshold)
    to_split = alive & grad_hot & (max_scale > scale_threshold)

    # Free-slot allocation: dead slots in index order; clones take the first
    # num_clone slots, split children the next num_split.
    dead_order = jnp.argsort(alive)  # dead (False) slots first, stable
    num_dead = cap - jnp.sum(alive)
    clone_rank = jnp.where(to_clone, jnp.cumsum(to_clone) - 1, -1)
    num_clone = jnp.sum(to_clone)
    split_rank = jnp.where(to_split, jnp.cumsum(to_split) - 1, -1)
    num_split = jnp.sum(to_split)

    # Capacity overflow: requests beyond the free-slot pool are dropped.
    clone_rank = jnp.where(clone_rank < num_dead, clone_rank, -1)
    child_rank = jnp.where(split_rank + num_clone < num_dead, split_rank, -1)
    dropped = (num_clone + num_split) - (
        jnp.sum(clone_rank >= 0) + jnp.sum(child_rank >= 0)
    )

    params = cloud.param_dict()

    # --- clone (`external.py:231-239`) ---
    params = _scatter_rows(params, clone_rank, dead_order)
    clone_dest_mask = jnp.zeros((cap,), bool).at[
        jnp.where(clone_rank >= 0, dead_order[jnp.clip(clone_rank, 0, cap - 1)], cap + 1)
    ].set(True, mode="drop")

    # --- split (`external.py:244-269`) ---
    k1, k2 = jax.random.split(key)
    std = jnp.exp(cloud.log_scales)
    rot = build_rotation(cloud.rotation_quaternions, eps=1e-12)
    jitter1 = jnp.einsum("nij,nj->ni", rot, jax.random.normal(k1, (cap, 3)) * std)
    jitter2 = jnp.einsum("nij,nj->ni", rot, jax.random.normal(k2, (cap, 3)) * std)
    child_log_scales = cloud.log_scales - jnp.log(
        config.split_scale_shrink * config.split_children
    )
    # Child 1 overwrites the original slot in place.
    params["means"] = jnp.where(
        to_split[:, None], cloud.means + jitter1, params["means"]
    )
    params["log_scales"] = jnp.where(
        to_split[:, None], child_log_scales, params["log_scales"]
    )
    # Child 2 goes to a fresh dead slot (after the clone block).
    child2_src = dict(
        params,
        means=cloud.means + jitter2,
        log_scales=child_log_scales,
        colors=cloud.colors,
        segmentation_masks=cloud.segmentation_masks,
        rotation_quaternions=cloud.rotation_quaternions,
        opacity_logits=cloud.opacity_logits,
    )
    child2_rank_offset = jnp.where(child_rank >= 0, child_rank + num_clone, -1)
    params = _scatter_rows(params, child2_rank_offset, dead_order, src_tree=child2_src)
    child2_dest_mask = jnp.zeros((cap,), bool).at[
        jnp.where(
            child2_rank_offset >= 0,
            dead_order[jnp.clip(child2_rank_offset, 0, cap - 1)],
            cap + 1,
        )
    ].set(True, mode="drop")

    alive = alive | clone_dest_mask | child2_dest_mask
    # Splits whose child-2 slot overflowed keep their in-place child-1 rewrite;
    # that still matches "original removed, one child kept" up to the dropped
    # sibling, and is the graceful-degradation choice under capacity pressure.

    # Zero moments wherever a new Gaussian landed (clone dests, child2 dests,
    # and in-place child1 rewrites), per `cat_params_to_optimizer` zero padding.
    fresh = clone_dest_mask | child2_dest_mask | to_split
    adam_state = _zero_moments_at(adam_state, fresh)

    # --- prune (`external.py:289-302`) ---
    is_final = jnp.asarray(i) == config.window_end
    opacity = jax.nn.sigmoid(params["opacity_logits"][:, 0])
    threshold = jnp.where(is_final, config.prune_opacity_final, config.prune_opacity)
    to_remove = opacity < threshold
    big = jnp.max(jnp.exp(params["log_scales"]), axis=1) > (
        config.prune_big_scale * scene_radius
    )
    to_remove = jnp.where(jnp.asarray(i) >= config.prune_big_start, to_remove | big, to_remove)
    alive = alive & jnp.logical_not(to_remove)

    new_cloud = cloud.replace(alive=alive, **params)
    # Stats arrays are recreated at the post-mutation size in the reference
    # (`external.py:272-278` + `remove_points` slicing) — with fixed capacity
    # that is simply a full zero reset.
    new_stats = init_stats(cap)
    info = {
        "cloned": jnp.sum(clone_dest_mask),
        "split": num_split,
        "pruned": jnp.sum(cloud.alive & to_remove),
        "dropped_for_capacity": dropped,
        "n_alive": jnp.sum(alive),
    }
    return new_cloud, adam_state, new_stats, info


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def reset_opacity(cloud: GaussianCloud, adam_state, config: DensifyConfig = DensifyConfig()):
    """`external.py:306-314`: opacity logits := inverse_sigmoid(0.01) (all
    slots), with the opacity moment buffers fully zeroed."""
    logits = jnp.full_like(
        cloud.opacity_logits, inverse_sigmoid(jnp.float32(config.opacity_reset_value))
    )
    new_cloud = cloud.replace(opacity_logits=logits)

    def zero_opacity(tree):
        t = dict(tree)
        t["opacity_logits"] = jnp.zeros_like(t["opacity_logits"])
        return t

    adam_state = adam_state._replace(
        mu=zero_opacity(adam_state.mu), nu=zero_opacity(adam_state.nu)
    )
    return new_cloud, adam_state
