"""Renderer acceptance tests: oracle self-consistency (finite differences) and
stream-vs-oracle agreement on images, depth, radii, and gradients
(SURVEY.md §4 'rasterizer acceptance tests')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.render.api import render
from splatpu.render.binning import BinningConfig, build_pair_stream

SMALL = BinningConfig(max_span=64, max_pairs=1 << 13, chunk_pairs=256)


def small_scene(seed=0, n=48, w=48, h=32):
    cloud = make_random_cloud(jax.random.key(seed), n)
    cam = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=w, height=h)
    return cloud, cam


class TestOracle:
    def test_background_only(self):
        cloud, cam = small_scene()
        # All opacities -> ~0: image should be the background.
        cloud = cloud.replace(opacity_logits=jnp.full_like(cloud.opacity_logits, -30.0))
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render(activate_cloud(cloud), cam, bg=bg, impl="oracle")
        np.testing.assert_allclose(
            np.asarray(out.image), np.broadcast_to(np.array([0.2, 0.4, 0.6])[:, None, None], out.image.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(out.final_transmittance), 1.0, atol=1e-5)

    def test_single_gaussian_peak_location(self):
        cloud, cam = small_scene(n=1)
        cloud = cloud.replace(
            means=jnp.array([[0.0, 0.0, 0.0]]),
            colors=jnp.array([[1.0, 0.0, 0.0]]),
            opacity_logits=jnp.array([[4.0]]),
            log_scales=jnp.log(jnp.full((1, 3), 0.1)),
        )
        out = render(activate_cloud(cloud), cam, impl="oracle")
        img = np.asarray(out.image)
        # Peak of the red channel should be near the projected center.
        from splatpu.core.projection import preprocess

        sp = preprocess(activate_cloud(cloud), cam)
        cx, cy = np.asarray(sp.mean2d)[0]
        iy, ix = np.unravel_index(np.argmax(img[0]), img[0].shape)
        assert abs(ix - cx) <= 1.0 and abs(iy - cy) <= 1.0
        assert img[1].max() < 1e-4  # no green anywhere

    def test_finite_difference_gradients(self):
        """Centered finite differences in float64 (f32 FD is below noise for
        an O(100) loss and 1e-4 steps)."""
        with jax.enable_x64():
            cloud, cam = small_scene(n=6, w=24, h=24)

            @jax.jit
            def loss_fn(means, log_scales, opacity_logits):
                c = cloud.replace(
                    means=means, log_scales=log_scales, opacity_logits=opacity_logits
                )
                out = render(activate_cloud(c), cam, impl="oracle")
                weights = jnp.cos(jnp.arange(out.image.size, dtype=jnp.float64))
                return jnp.sum(out.image * weights.reshape(out.image.shape))

            args = tuple(
                np.asarray(x, np.float64)
                for x in (cloud.means, cloud.log_scales, cloud.opacity_logits)
            )
            grads = jax.grad(loss_fn, argnums=(0, 1, 2))(*args)
            eps = 1e-5
            rng = np.random.default_rng(0)
            for ai in range(3):
                a = args[ai]
                flat_idx = rng.choice(a.size, size=min(5, a.size), replace=False)
                for fi in flat_idx:
                    idx = np.unravel_index(fi, a.shape)
                    # float() forces completion before the in-place mutation:
                    # jax wraps f64 numpy buffers zero-copy on CPU, so an
                    # async computation could otherwise read mutated data.
                    perturbed = [x.copy() for x in args]
                    perturbed[ai][idx] += eps
                    up = float(loss_fn(*perturbed))
                    perturbed[ai][idx] -= 2 * eps
                    down = float(loss_fn(*perturbed))
                    fd = (up - down) / (2 * eps)
                    an = float(np.asarray(grads[ai])[idx])
                    assert an == pytest.approx(fd, abs=1e-4, rel=1e-3), (ai, idx)


class TestStreamVsOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_forward_matches(self, seed):
        cloud, cam = small_scene(seed=seed)
        args = activate_cloud(cloud)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render(args, cam, bg=bg, impl="oracle")
        got = render(args, cam, bg=bg, impl="stream", config=SMALL)
        np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=2e-3)
        np.testing.assert_allclose(np.asarray(got.radii), np.asarray(ref.radii), atol=0)
        np.testing.assert_allclose(
            np.asarray(got.final_transmittance), np.asarray(ref.final_transmittance), atol=2e-4
        )

    @pytest.mark.slow
    def test_gradients_match(self):
        cloud, cam = small_scene(seed=3, n=32)
        target = jnp.zeros((3, cam.height, cam.width))

        def loss(params, impl):
            c = cloud.replace(**params)
            out = render(activate_cloud(c), cam, impl=impl, config=SMALL)
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

        params = cloud.param_dict()
        g_ref = jax.grad(lambda p: loss(p, "oracle"))(params)
        g_new = jax.grad(lambda p: loss(p, "stream"))(params)
        for name in ["means", "colors", "opacity_logits", "log_scales", "rotation_quaternions"]:
            a = np.asarray(g_ref[name])
            b = np.asarray(g_new[name])
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-3, err_msg=name)

    def test_means2d_gradient_collector(self):
        """The means2d_offset cotangent must match the oracle's (this is the
        signal densification thresholds read, `external.py:113-124`)."""
        cloud, cam = small_scene(seed=4, n=24)

        def screen_grads(impl):
            def loss(offset):
                args = activate_cloud(cloud).replace(means2d_offset=offset)
                out = render(args, cam, impl=impl, config=SMALL)
                return jnp.mean(jnp.abs(out.image - 0.5))

            return jax.grad(loss)(jnp.zeros((cloud.capacity, 2)))

        a = np.asarray(screen_grads("oracle"))
        b = np.asarray(screen_grads("stream"))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-3)
        assert np.abs(a).max() > 0  # the collector actually receives signal


class TestBinning:
    def test_pair_budget_overflow_flag(self):
        cloud, cam = small_scene(n=64)
        tiny = BinningConfig(max_span=64, max_pairs=8, chunk_pairs=8)
        stream = build_pair_stream(activate_cloud(cloud), cam, tiny)
        assert bool(stream.overflowed)

    def test_ranges_are_consistent(self):
        cloud, cam = small_scene(n=40)
        stream = build_pair_stream(activate_cloud(cloud), cam, SMALL)
        start = np.asarray(stream.start)
        end = np.asarray(stream.end)
        tile = np.asarray(stream.tile)
        assert (end >= start).all()
        total = int(np.asarray(stream.total_pairs))
        assert (end - start).sum() == total
        for t in [0, 3, len(start) // 2]:
            seg = tile[start[t] : end[t]]
            assert (seg == t).all()
