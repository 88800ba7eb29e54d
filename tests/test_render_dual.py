"""render_dual (shared-binning image+seg) must equal two independent renders,
including the image-only means2d gradient contract (`densify.py:130-132`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.render.api import render, render_dual
from splatpu.render.binning import BinningConfig

CFG = BinningConfig(max_span=32, max_pairs=1 << 12, chunk_pairs=256)


@pytest.mark.parametrize("impl", ["stream", "pallas"])
def test_dual_matches_separate(impl):
    cloud = make_random_cloud(jax.random.key(0), 48)
    cam = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=48, height=32)
    args = activate_cloud(cloud)
    a, b = render_dual(args, cloud.segmentation_masks, cam, impl=impl, config=CFG)
    ra = render(args, cam, impl=impl, config=CFG)
    rb = render(
        args.replace(colors=cloud.segmentation_masks), cam, impl=impl, config=CFG
    )
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(ra.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.image), np.asarray(rb.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.radii), np.asarray(ra.radii))


def test_dual_gradient_contract():
    """Offset cotangent = image-loss only; other params get both losses."""
    cloud = make_random_cloud(jax.random.key(1), 32)
    cam = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=48, height=32)

    def losses(params, offset, mode):
        c = cloud.replace(**params)
        args = activate_cloud(c).replace(means2d_offset=offset)
        if mode == "dual":
            out, seg = render_dual(
                args, c.segmentation_masks, cam, impl="stream", config=CFG
            )
        else:
            out = render(args, cam, impl="stream", config=CFG)
            seg_args = args.replace(
                colors=c.segmentation_masks, means2d_offset=jnp.zeros_like(offset)
            )
            seg = render(seg_args, cam, impl="stream", config=CFG)
        return jnp.mean(jnp.abs(out.image - 0.4)) + 3.0 * jnp.mean(
            jnp.abs(seg.image - 0.2)
        )

    p = cloud.param_dict()
    z = jnp.zeros((cloud.capacity, 2))
    for argnum in (0, 1):
        g_dual = jax.grad(losses, argnums=argnum)(p, z, "dual")
        g_sep = jax.grad(losses, argnums=argnum)(p, z, "separate")
        for a, b in zip(jax.tree.leaves(g_dual), jax.tree.leaves(g_sep)):
            scale = np.abs(np.asarray(b)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
            )
