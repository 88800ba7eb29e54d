"""Exact-binning Pallas path (render/exact.py) vs oracle and vs the padded
first-generation path — forward, gradients, dual render, edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
from splatpu.render.api import render, render_dual
from splatpu.render.binning import BinningConfig

CFG = BinningConfig(max_span=64, max_pairs=1 << 12, chunk_pairs=256)
# (kernel flavor, in-kernel lane-scan flavor) combinations under test.
KERNELS = [("grid", "mxu"), ("grid", "mxu2"), ("grid", "rolls"), ("manual", "mxu2")]


def cfg_for(kernel, scan="mxu"):
    if isinstance(kernel, tuple):
        kernel, scan = kernel
    return BinningConfig(
        max_span=64, max_pairs=1 << 12, chunk_pairs=256, kernel=kernel, scan=scan
    )


def scene(seed=0, n=48, w=48, h=32):
    cloud = make_random_cloud(jax.random.key(seed), n)
    cam = make_lookat_camera(eye=(0.3, -0.2, -4.0), width=w, height=h)
    return cloud, cam


class TestExactVsOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("kernel", KERNELS)
    def test_forward(self, seed, kernel):
        cloud, cam = scene(seed)
        args = activate_cloud(cloud)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render(args, cam, bg=bg, impl="oracle")
        got = render(args, cam, bg=bg, impl="pallas", config=cfg_for(kernel))
        np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(got.final_transmittance),
            np.asarray(ref.final_transmittance),
            atol=2e-5,
        )

    @pytest.mark.slow
    def test_forward_wide_scene(self):
        # More tiles than one chunk; segments straddle chunk boundaries.
        cloud, cam = scene(5, n=96, w=96, h=64)
        args = activate_cloud(cloud)
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="pallas", config=BinningConfig(
            max_span=64, max_pairs=1 << 13, chunk_pairs=128))
        np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image), atol=2e-5)

    @pytest.mark.parametrize("kernel", KERNELS)
    def test_gradients(self, kernel):
        cloud, cam = scene(2)
        bg = jnp.array([0.1, 0.2, 0.3])
        cfg = cfg_for(kernel)

        def loss(params, impl):
            c = cloud.replace(**params)
            out = render(activate_cloud(c), cam, bg=bg, impl=impl, config=cfg)
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

    def test_dual_render_matches_padded(self):
        cloud, cam = scene(4)
        args = activate_cloud(cloud)
        seg = jnp.abs(jnp.sin(jnp.arange(cloud.capacity * 3, dtype=jnp.float32)))
        seg = seg.reshape(cloud.capacity, 3)
        a1, a2 = render_dual(args, seg, cam, impl="pallas", config=CFG)
        b1, b2 = render_dual(args, seg, cam, impl="stream", config=CFG)
        np.testing.assert_allclose(np.asarray(a1.image), np.asarray(b1.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(a2.image), np.asarray(b2.image), atol=2e-5)

    def test_dual_render_grad_contract(self):
        # means2d_offset receives cotangents from the PRIMARY render only.
        cloud, cam = scene(6, n=24)
        seg = jnp.abs(jnp.cos(jnp.arange(cloud.capacity * 3, dtype=jnp.float32)))
        seg = seg.reshape(cloud.capacity, 3)

        def grads(impl):
            def loss(offset, which):
                args = activate_cloud(cloud).replace(means2d_offset=offset)
                o1, o2 = render_dual(args, seg, cam, impl=impl, config=CFG)
                img = o1.image if which == 0 else o2.image
                return jnp.mean(jnp.abs(img - 0.5))

            z = jnp.zeros((cloud.capacity, 2))
            return (
                np.asarray(jax.grad(loss)(z, 0)),
                np.asarray(jax.grad(loss)(z, 1)),
            )

        g1, g2 = grads("pallas")
        assert np.abs(g1).max() > 0
        np.testing.assert_allclose(g2, 0.0, atol=1e-12)

    @pytest.mark.slow
    def test_big_gaussian_two_class_emission(self):
        # Gaussians spanning far more than span_small tiles must route through
        # the compacted big-Gaussian emission domain and still match the oracle.
        cloud, cam = scene(7, n=24, w=96, h=64)
        cloud = cloud.replace(log_scales=cloud.log_scales + 1.5)  # inflate
        args = activate_cloud(cloud)
        cfg = BinningConfig(
            max_span=256, span_small=8, big_capacity=1024,
            max_pairs=1 << 14, chunk_pairs=128,
        )
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="pallas", config=cfg)
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=3e-5
        )

        def loss(means):
            out = render(
                activate_cloud(cloud.replace(means=means)), cam,
                impl="pallas", config=cfg,
            )
            return jnp.mean(jnp.abs(out.image - 0.4))

        def loss_ref(means):
            out = render(
                activate_cloud(cloud.replace(means=means)), cam, impl="oracle"
            )
            return jnp.mean(jnp.abs(out.image - 0.4))

        g = np.asarray(jax.grad(loss)(cloud.means))
        g_ref = np.asarray(jax.grad(loss_ref)(cloud.means))
        scale = np.abs(g_ref).max() + 1e-8
        np.testing.assert_allclose(g / scale, g_ref / scale, atol=1e-4)

    def test_empty_scene(self):
        cloud, cam = scene(0, n=8)
        args = activate_cloud(cloud.replace(alive=jnp.zeros(8, bool)))
        bg = jnp.array([0.4, 0.5, 0.6])
        out = render(args, cam, bg=bg, impl="pallas", config=CFG)
        img = np.asarray(out.image)
        np.testing.assert_allclose(img[0], 0.4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.final_transmittance), 1.0, atol=1e-6)


class TestExactEdgeCases:
    def test_non_tile_aligned_image(self):
        # Width/height not multiples of 16: untile must crop correctly.
        cloud, cam = scene(8, n=32, w=50, h=34)
        args = activate_cloud(cloud)
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="pallas", config=CFG)
        assert got.image.shape == (3, 34, 50)
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )

    def test_exact_budget_overflow_flag(self):
        from splatpu.render.exact import build_exact_stream

        cloud, cam = scene(9, n=64, w=64, h=48)
        # cull_tiles off: culling can legitimately fit this scene within the
        # tiny budget — the test targets the overflow flag, not the cull.
        tiny = BinningConfig(
            max_span=64, max_pairs=128, chunk_pairs=128, cull_tiles=False
        )
        stream = build_exact_stream(activate_cloud(cloud), cam, tiny)
        assert bool(stream.overflowed)
        # Render still completes and produces finite pixels.
        out = render(activate_cloud(cloud), cam, impl="pallas", config=tiny)
        assert np.isfinite(np.asarray(out.image)).all()

    def test_big_capacity_overflow_flag(self):
        from splatpu.render.exact import build_exact_stream

        cloud, cam = scene(10, n=48, w=64, h=48)
        cloud = cloud.replace(log_scales=cloud.log_scales + 1.5)
        cfg = BinningConfig(
            max_span=256, span_small=4, big_capacity=2,
            max_pairs=1 << 14, chunk_pairs=128,
        )
        stream = build_exact_stream(activate_cloud(cloud), cam, cfg)
        assert bool(stream.overflowed)  # more than 2 big gaussians

    def test_single_channel_colors(self):
        from splatpu.core.types import RenderArgs

        cloud, cam = scene(11, n=24)
        args = activate_cloud(cloud)
        gray = args.colors[:, :1]
        args1 = args.replace(colors=gray)
        ref = render(args1, cam, impl="oracle", bg=jnp.array([0.2]))
        got = render(args1, cam, impl="pallas", bg=jnp.array([0.2]), config=CFG)
        assert got.image.shape[0] == 1
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )

    def test_routing_consistent_under_big_capacity_overflow(self):
        # Over-capacity big Gaussians must be dropped WITHOUT corrupting the
        # emission-slot -> sorted-position map of everyone else (regression:
        # valid_p overcounting + slot holes scrambled pos_of_slot wholesale).
        from splatpu.render.exact import build_exact_stream, pos_of_slot_of

        cloud, cam = scene(12, n=48, w=64, h=48)
        cloud = cloud.replace(log_scales=cloud.log_scales + 1.5)
        cfg = BinningConfig(
            max_span=256, span_small=4, big_capacity=2,
            max_pairs=1 << 14, chunk_pairs=128,
        )
        st = build_exact_stream(activate_cloud(cloud), cam, cfg)
        assert bool(st.overflowed)
        gid = np.asarray(st.gid)
        pos_of_slot = np.asarray(pos_of_slot_of(st.offsets, st.gid, st.lane))
        offsets = np.asarray(st.offsets)
        counts = np.asarray(st.counts)
        mp = cfg.max_pairs
        checked = 0
        for g in range(48):
            for s in range(counts[g]):
                p = pos_of_slot[offsets[g] + s]
                assert p < mp, (g, s)
                assert gid[p] == g, (g, s, p, gid[p])
                checked += 1
        assert checked > 0


class TestTile32:
    """BinningConfig.tile=32: quarter the tile count, same contract."""

    def _cfg(self, **kw):
        return BinningConfig(
            tile=32, max_span=64, max_pairs=1 << 12, chunk_pairs=128, **kw
        )

    @pytest.mark.slow
    def test_forward_matches_oracle(self):
        cloud, cam = scene(3, n=80, w=72, h=56)  # non-multiple of 32
        args = activate_cloud(cloud)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render(args, cam, bg=bg, impl="oracle")
        got = render(args, cam, bg=bg, impl="pallas", config=self._cfg())
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.depth), np.asarray(ref.depth), atol=2e-4
        )

    @pytest.mark.slow
    def test_gradients_match_oracle(self):
        cloud, cam = scene(4, n=64, w=64, h=64)
        args0 = activate_cloud(cloud)

        def loss(m, impl, cfg):
            out = render(args0.replace(means3d=m), cam, impl=impl, config=cfg)
            return jnp.mean(out.image**2) + 0.1 * jnp.mean(out.depth)

        g_ref = jax.grad(lambda m: loss(m, "oracle", None))(args0.means3d)
        g_got = jax.grad(lambda m: loss(m, "pallas", self._cfg()))(args0.means3d)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=2e-6
        )

    def test_stream_supports_tile32(self):
        cloud, cam = scene(6, n=48, w=64, h=48)
        args = activate_cloud(cloud)
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="stream", config=self._cfg())
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )


class TestProdScan:
    """scan='prod': transmittance carried as a direct (1-alpha) product via
    multiplicative roll scans (no log1p/exp in the grid kernels) — must match
    the oracle on images and gradients."""

    @pytest.mark.slow
    def test_matches_oracle_image_and_grads(self):
        cloud, cam = scene(3, n=48, w=96, h=64)
        cfg = BinningConfig(
            scan="prod", tile=32, max_span=64, max_pairs=1 << 13,
            chunk_pairs=128,
        )
        args = activate_cloud(cloud)
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="pallas", config=cfg)
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )

        def loss(means, impl, config=None):
            out = render(
                activate_cloud(cloud.replace(means=means)), cam,
                impl=impl, config=config,
            )
            return jnp.mean(jnp.abs(out.image - 0.4)) + 0.05 * jnp.mean(out.depth)

        g = jax.grad(loss)(cloud.means, "pallas", cfg)
        go = jax.grad(loss)(cloud.means, "oracle")
        ref_scale = np.abs(np.asarray(go)).max()
        np.testing.assert_allclose(
            np.asarray(g) / ref_scale, np.asarray(go) / ref_scale, atol=5e-5
        )

    def test_deep_stack_termination(self):
        # Many overlapping opaque gaussians: exercises the termination path
        # (underflowed products in masked tail lanes must stay harmless).
        cloud, cam = scene(5, n=96, w=32, h=32)
        cloud = cloud.replace(
            opacity_logits=jnp.full_like(cloud.opacity_logits, 4.0)
        )
        cfg = BinningConfig(
            scan="prod", tile=32, max_span=64, max_pairs=1 << 13,
            chunk_pairs=128,
        )
        args = activate_cloud(cloud)
        ref = render(args, cam, impl="oracle")
        got = render(args, cam, impl="pallas", config=cfg)
        np.testing.assert_allclose(
            np.asarray(got.image), np.asarray(ref.image), atol=2e-5
        )


class TestTileCulling:
    """cull_tiles drops only pairs with alpha < 1/255 everywhere in their
    tile — output and gradients must be bit-comparable to the unculled path,
    with measurably fewer pairs on low-opacity scenes."""

    def _scene(self):
        cloud, cam = scene(7, n=96, w=96, h=64)
        # Force low opacities (stage-1 post-reset regime) so the effective
        # radius shrinks well below the 3-sigma rect.
        cloud = cloud.replace(
            opacity_logits=jnp.full_like(cloud.opacity_logits, -3.5)
        )
        return cloud, cam

    def _cfg(self, cull):
        return BinningConfig(
            max_span=64, max_pairs=1 << 13, chunk_pairs=128, cull_tiles=cull
        )

    def test_output_identical_and_pairs_reduced(self):
        from splatpu.render.exact import build_exact_stream

        cloud, cam = self._scene()
        args = activate_cloud(cloud)
        on = render(args, cam, impl="pallas", config=self._cfg(True))
        off = render(args, cam, impl="pallas", config=self._cfg(False))
        np.testing.assert_allclose(
            np.asarray(on.image), np.asarray(off.image), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(on.depth), np.asarray(off.depth), atol=1e-6
        )
        p_on = int(build_exact_stream(args, cam, self._cfg(True)).total_pairs)
        p_off = int(build_exact_stream(args, cam, self._cfg(False)).total_pairs)
        assert p_on < p_off * 0.7, (p_on, p_off)

    @pytest.mark.slow
    def test_gradients_identical(self):
        cloud, cam = self._scene()
        args0 = activate_cloud(cloud)

        def loss(m, cull):
            out = render(
                args0.replace(means3d=m), cam, impl="pallas",
                config=self._cfg(cull),
            )
            return jnp.mean(out.image**2) + 0.1 * jnp.mean(out.depth)

        g_on = jax.grad(lambda m: loss(m, True))(args0.means3d)
        g_off = jax.grad(lambda m: loss(m, False))(args0.means3d)
        np.testing.assert_allclose(
            np.asarray(g_on), np.asarray(g_off), atol=1e-7
        )


def test_cumsum_pairs_pallas_matches_jnp():
    """The sequential-grid carry cumsum (routing path at 500k+ scale) must
    match jnp.cumsum to split-bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatpu.render.exact import _cumsum_pairs_pallas

    x = jax.random.normal(jax.random.key(0), (10, 8192), jnp.float32)
    got = _cumsum_pairs_pallas(x, block_cols=2048)
    want = jnp.cumsum(x, axis=1)
    # Split-bf16 block scans: abs error ~eps * |running sum| (values here
    # reach ~1e2); the routing boundary DIFFERENCES cancel the carry error
    # common to both endpoints, so segment sums stay far tighter than this.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-3
    )
    # Non-divisible widths fall back to jnp.cumsum exactly.
    y = x[:, :1000]
    np.testing.assert_array_equal(
        np.asarray(_cumsum_pairs_pallas(y, block_cols=2048)),
        np.asarray(jnp.cumsum(y, axis=1)),
    )


class TestForwardOnlyCost:
    """The emission-slot inversion is a BACKWARD-only cost: forward-only
    renders (inference, truth staging) must trace exactly one sort (the
    binning key sort), while fwd+bwd adds the invert-by-sort
    (`pos_of_slot_of`).  Guards the round-4 restructure that moved the
    inversion out of `build_exact_stream`."""

    @staticmethod
    def _count_sorts(jaxpr):
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "sort":
                n += 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):  # closed sub-jaxprs (custom_vjp etc.)
                    n += TestForwardOnlyCost._count_sorts(v.jaxpr)
        return n

    def test_fwd_traces_one_sort_bwd_two(self):
        cloud, cam = scene(3)
        args = activate_cloud(cloud)

        def fwd(means):
            out = render(args.replace(means3d=means), cam, impl="pallas", config=CFG)
            return jnp.sum(out.image)

        fwd_sorts = self._count_sorts(jax.make_jaxpr(fwd)(args.means3d).jaxpr)
        bwd_sorts = self._count_sorts(
            jax.make_jaxpr(jax.grad(fwd))(args.means3d).jaxpr
        )
        # Forward: big-class compaction sort + binning key sort.  Backward
        # adds EXACTLY one more (the slot inversion) — if this grows, the
        # inversion leaked back into the forward path.
        assert bwd_sorts == fwd_sorts + 1, (fwd_sorts, bwd_sorts)
        assert fwd_sorts == 2, fwd_sorts
