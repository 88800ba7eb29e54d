"""Pallas compositor vs oracle (interpreter mode on CPU; the same kernels are
exercised compiled on real TPU by bench.py and the TPU check scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig

CFG = BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256)


def scene(seed=0, n=48):
    cloud = make_random_cloud(jax.random.key(seed), n)
    cam = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=48, height=32)
    return cloud, cam


class TestPallasVsOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_forward(self, seed):
        cloud, cam = scene(seed)
        args = activate_cloud(cloud)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render(args, cam, bg=bg, impl="oracle")
        got = render(args, cam, bg=bg, impl="pallas", config=CFG)
        np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(got.final_transmittance),
            np.asarray(ref.final_transmittance),
            atol=2e-5,
        )

    @pytest.mark.slow
    def test_gradients(self):
        cloud, cam = scene(2)
        bg = jnp.array([0.1, 0.2, 0.3])

        def loss(params, impl):
            c = cloud.replace(**params)
            out = render(activate_cloud(c), cam, bg=bg, impl=impl, config=CFG)
            return (
                jnp.mean(jnp.abs(out.image - 0.4))
                + 0.1 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.final_transmittance)
            )

        p = cloud.param_dict()
        g_ref = jax.grad(lambda q: loss(q, "oracle"))(p)
        g_new = jax.grad(lambda q: loss(q, "pallas"))(p)
        for k in p:
            a, b = np.asarray(g_ref[k]), np.asarray(g_new[k])
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-4, err_msg=k)

    @pytest.mark.slow
    def test_means2d_collector(self):
        cloud, cam = scene(3, n=24)

        def screen_grads(impl):
            def loss(offset):
                args = activate_cloud(cloud).replace(means2d_offset=offset)
                out = render(args, cam, impl=impl, config=CFG)
                return jnp.mean(jnp.abs(out.image - 0.5))

            return jax.grad(loss)(jnp.zeros((cloud.capacity, 2)))

        a = np.asarray(screen_grads("oracle"))
        b = np.asarray(screen_grads("pallas"))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4)
        assert np.abs(a).max() > 0
