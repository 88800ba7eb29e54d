"""Camera-sharded rendering/losses via shard_map (SURVEY.md §5.7/§5.8).

The stage-2 step cost is dominated by rendering V sampled views.  Views are
the data axis: shard them over the mesh's ``cameras`` axis, render locally,
`psum` the scalar loss terms.  Under `jax.grad`, shard_map transposes the
psum automatically, so deformation-network gradients arrive already
all-reduced — the only trainable state is the small MLP, which stays
replicated (the reference's Gaussian cloud is frozen in stage 2 and is also
replicated).

Views that don't divide the mesh axis are padded and masked with zero weight
(the reference's 5-view sample, `train.py:753`, rarely divides a TPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from splatpu.core.ssim import ssim
from splatpu.core.types import Camera
from splatpu.render.api import render


def pad_views(w2c, K, images, axis_size: int):
    """Pad the view batch to a multiple of the mesh axis; returns arrays plus
    a (V,) weight vector (1 real, 0 padding)."""
    v = w2c.shape[0]
    pad = (-v) % axis_size
    weights = jnp.concatenate([jnp.ones((v,)), jnp.zeros((pad,))])
    if pad:
        rep = lambda a: jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
        w2c, K, images = rep(w2c), rep(K), rep(images)
    return w2c, K, images, weights


def pad_picks(pick, axis_size: int):
    """Pad a (V,) view-index vector to a multiple of the mesh axis; returns
    (padded_pick, weights) with weights 1 for real entries, 0 for padding
    (padding repeats index 0 — weight-masked downstream).  Single home for
    the pick-padding recipe used by stage2.train, the driver dry-run, and
    the distributed tests."""
    v = pick.shape[0]
    pad = (-v) % axis_size
    weights = jnp.concatenate([jnp.ones((v,)), jnp.zeros((pad,))])
    if pad:
        pick = jnp.concatenate(
            [pick, jnp.zeros((pad,), pick.dtype)], axis=0
        )
    return pick, weights


def make_camera_sharded_image_losses(
    mesh: Mesh, camera_static: Camera, renderer: str, binning
):
    """Returns image_losses(args, w2c, K, images, weights) ->
    (l1_sum, ssim_sum, overflow_max, span_overflow_max) with views sharded
    over the ``cameras`` mesh axis.

    `args` (activated cloud) is replicated; the loss outputs are replicated
    sums identical to the single-device computation, and overflow_max is the
    pmax'd binning-overflow flag across all views.
    """

    def local(args, w2c, K, images, weights):
        def render_one(view):
            vw2c, vK, target, weight = view
            cam = camera_static.replace(w2c=vw2c, K=vK)
            out = render(args, cam, impl=renderer, config=binning)
            l1 = jnp.mean(jnp.abs(out.image - target)) * weight
            s = (1.0 - ssim(out.image, target)) * weight
            overflow = jax.lax.stop_gradient(
                out.overflowed.astype(jnp.float32) * weight
            )
            span = jax.lax.stop_gradient(
                out.span_overflowed.astype(jnp.float32) * weight
            )
            return l1, s, overflow, span

        l1s, ssims, overflows, spans = jax.lax.map(
            render_one, (w2c, K, images, weights)
        )
        return (
            jax.lax.psum(jnp.sum(l1s), "cameras"),
            jax.lax.psum(jnp.sum(ssims), "cameras"),
            jax.lax.pmax(jnp.max(overflows), "cameras"),
            jax.lax.pmax(jnp.max(spans), "cameras"),
        )

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("cameras"), P("cameras"), P("cameras"), P("cameras")),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return sharded
