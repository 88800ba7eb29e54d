"""Distributed stage-2 training step: camera-sharded rendering, psum'd grads.

Same math as `splatpu.train.stage2.make_train_step`, with the per-view render
loop replaced by the shard_map'd version from `splatpu.dist.sharding`.  The
deformation network (the only trainable state, `train.py:703-705`) is
replicated; its gradients come out of the shard_map transpose already
all-reduced over the ``cameras`` axis.

The step signature matches `stage2.make_train_step` (all cameras of the
timestep staged once, per-step `pick` gathered on device) plus a padded pick
and per-view weight vector so the sampled view count need not divide the mesh
axis — `stage2.train(config with mesh_cameras > 0)` switches between the two
transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from splatpu.core.types import Camera, GaussianCloud, activate_cloud
from splatpu.dist.sharding import make_camera_sharded_image_losses
from splatpu.dynamics.deform import update_cloud_parameters
from splatpu.dynamics.rigidity import rigidity_loss
from splatpu.train.losses import L1_WEIGHT, RIGIDITY_WEIGHT, SSIM_WEIGHT


def make_sharded_train_step(
    optimizer,
    config,
    mesh: Mesh,
    camera_static: Camera,
):
    """Like `stage2.make_train_step` but with views sharded over the mesh.

    `pick` must already be padded to a multiple of the ``cameras`` axis
    (repeat any index) with `weights` marking real (1) vs padding (0) views.
    Device state (cloud, encodings, graph) is passed per call, never closed
    over (axon embedded-constant cost; see stage2.make_train_step)."""
    from splatpu.train.stage2 import snapshot_previous

    net_config = config.net_config()
    image_losses = make_camera_sharded_image_losses(
        mesh, camera_static, config.renderer, config.binning
    )

    def step(
        net_params,
        opt_state,
        encoded_previous,
        previous_fg,
        timestep,
        all_w2c,   # (C, 4, 4) — ALL cameras of this timestep, staged once
        all_K,     # (C, 3, 3)
        all_images,  # (C, 3, H, W) f32 or uint8
        pick,      # (Vp,) int32 — sampled views, padded to the mesh axis
        weights,   # (Vp,) f32 — 1 real view, 0 padding
        initial_cloud: GaussianCloud,
        encoded_initial,
        fg_idx,
        neighbor_info,
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
            l1_sum, ssim_sum, overflow, span_overflow = image_losses(
                args, w2c, K, images, weights
            )
            image_loss = L1_WEIGHT * l1_sum + SSIM_WEIGHT * ssim_sum
            # Rigidity is summed once per *real* sampled view (`train.py:395-418`).
            n_views = jnp.sum(weights)
            total = image_loss + RIGIDITY_WEIGHT * (n_views * rig)
            aux = {
                "l1": l1_sum,
                "ssim": ssim_sum,
                "image": image_loss,
                "rigidity": n_views * rig,
                "total": total,
                "binning_overflow": overflow,
                "span_overflow": span_overflow,
                "_updated": updated,
            }
            return total, aux

        grads, aux = jax.grad(losses, has_aux=True)(net_params)
        updated = aux.pop("_updated")
        grad_norm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
        updates, opt_state = optimizer.update(grads, opt_state, net_params)
        net_params = jax.tree.map(lambda p, u: p + u, net_params, updates)
        enc_prev, prev_fg = snapshot_previous(
            jax.lax.stop_gradient(updated), fg_idx, neighbor_info, config.quirk_compat
        )
        aux["grad_norm"] = grad_norm
        return net_params, opt_state, enc_prev, prev_fg, aux

    from splatpu.core.tpuopts import train_step_compiler_options

    return jax.jit(step, compiler_options=train_step_compiler_options())
