"""Densification-engine tests on synthetic clouds with known masks
(SURVEY.md §4: fixed-capacity clone/split/prune + optimizer-state surgery)."""

import jax
import jax.numpy as jnp
import numpy as np

from splatpu.data.synthetic import make_random_cloud
from splatpu.growth.densify import (
    DensifyConfig,
    accumulate_stats,
    densify_and_prune,
    init_stats,
    inverse_sigmoid,
    reset_opacity,
)
from splatpu.train.optim import make_stage1_adam

CFG = DensifyConfig()


def setup(n=16, cap=64, seed=0):
    cloud = make_random_cloud(jax.random.key(seed), n, capacity=cap)
    adam = make_stage1_adam()
    state = adam.init(cloud.param_dict())
    # Make moments nonzero so surgery is observable.
    state = state._replace(
        mu=jax.tree.map(lambda x: jnp.ones_like(x), state.mu),
        nu=jax.tree.map(lambda x: jnp.ones_like(x) * 2.0, state.nu),
    )
    return cloud, adam, state


def stats_with_grads(cloud, hot_mask, grad_value=1e-3):
    stats = init_stats(cloud.capacity)
    g = jnp.where(hot_mask[:, None], grad_value, 0.0) * jnp.ones((cloud.capacity, 2))
    radii = jnp.where(cloud.alive, 5.0, 0.0)
    return accumulate_stats(stats, g, radii)


class TestClone:
    def test_clone_copies_rows_and_zeroes_moments(self):
        cloud, adam, state = setup()
        # Gaussian 0 hot + small -> clone; others cold.
        hot = jnp.zeros((cloud.capacity,), bool).at[0].set(True)
        cloud = cloud.replace(
            log_scales=cloud.log_scales.at[:].set(jnp.log(0.001)),
            opacity_logits=jnp.full_like(cloud.opacity_logits, 3.0),
        )
        stats = stats_with_grads(cloud, hot)
        key = jax.random.key(1)
        new_cloud, new_state, new_stats, info = densify_and_prune(
            cloud, state, stats, key, 600, scene_radius=1.0, config=CFG
        )
        assert int(info["cloned"]) == 1
        assert int(info["n_alive"]) == 17
        # The clone landed in the first dead slot (16) with identical values.
        np.testing.assert_allclose(
            np.asarray(new_cloud.means[16]), np.asarray(cloud.means[0])
        )
        # Moments zeroed at the destination, untouched at survivors.
        assert np.asarray(new_state.mu["means"][16]).max() == 0.0
        assert np.asarray(new_state.mu["means"][1]).min() == 1.0
        # Stats fully reset after mutation.
        assert float(new_stats.grad_accum.max()) == 0.0

    def test_no_clone_below_threshold(self):
        cloud, adam, state = setup()
        stats = stats_with_grads(cloud, jnp.zeros((cloud.capacity,), bool))
        cloud = cloud.replace(opacity_logits=jnp.full_like(cloud.opacity_logits, 3.0))
        _, _, _, info = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 600, 1.0, CFG
        )
        assert int(info["cloned"]) == 0


class TestSplit:
    def test_split_replaces_original_with_two_children(self):
        cloud, adam, state = setup()
        hot = jnp.zeros((cloud.capacity,), bool).at[2].set(True)
        # Big scale -> split path.
        cloud = cloud.replace(
            log_scales=cloud.log_scales.at[:].set(jnp.log(0.05)),
            opacity_logits=jnp.full_like(cloud.opacity_logits, 3.0),
        )
        stats = stats_with_grads(cloud, hot)
        new_cloud, new_state, _, info = densify_and_prune(
            cloud, state, stats, jax.random.key(2), 600, scene_radius=1.0, config=CFG
        )
        assert int(info["split"]) == 1
        # Original count preserved +1 (one child in place, one in a new slot).
        assert int(info["n_alive"]) == 17
        # Child scales divided by 0.8 * 2 = 1.6.
        np.testing.assert_allclose(
            np.asarray(jnp.exp(new_cloud.log_scales[2])),
            np.asarray(jnp.exp(cloud.log_scales[2])) / 1.6,
            rtol=1e-4,
        )
        child2 = 16  # first dead slot
        np.testing.assert_allclose(
            np.asarray(jnp.exp(new_cloud.log_scales[child2])),
            np.asarray(jnp.exp(cloud.log_scales[2])) / 1.6,
            rtol=1e-4,
        )
        # Children means are jittered around the original.
        d1 = np.linalg.norm(np.asarray(new_cloud.means[2] - cloud.means[2]))
        d2 = np.linalg.norm(np.asarray(new_cloud.means[child2] - cloud.means[2]))
        assert 0 < d1 < 0.5 and 0 < d2 < 0.5
        # Moments zeroed at both child slots.
        assert np.asarray(new_state.mu["means"][2]).max() == 0.0
        assert np.asarray(new_state.mu["means"][child2]).max() == 0.0


class TestPrune:
    def test_prune_low_opacity(self):
        cloud, adam, state = setup()
        logits = jnp.full_like(cloud.opacity_logits, 3.0)
        logits = logits.at[5].set(inverse_sigmoid(0.001))
        cloud = cloud.replace(opacity_logits=logits)
        stats = stats_with_grads(cloud, jnp.zeros((cloud.capacity,), bool))
        new_cloud, _, _, info = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 600, 1.0, CFG
        )
        assert not bool(new_cloud.alive[5])
        assert int(info["pruned"]) == 1

    def test_final_iteration_aggressive_prune(self):
        cloud, adam, state = setup()
        logits = jnp.full_like(cloud.opacity_logits, inverse_sigmoid(0.1))
        cloud = cloud.replace(opacity_logits=logits)
        stats = stats_with_grads(cloud, jnp.zeros((cloud.capacity,), bool))
        # 0.1 > 0.005 -> survives normally...
        new_cloud, *_ = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 600, 1.0, CFG
        )
        assert int(new_cloud.n_alive()) == 16
        # ...but 0.1 < 0.25 -> all pruned on the final window iteration.
        new_cloud, *_ = densify_and_prune(
            cloud, state, stats, jax.random.key(0), CFG.window_end, 1.0, CFG
        )
        assert int(new_cloud.n_alive()) == 0

    def test_prune_big_after_3000(self):
        cloud, adam, state = setup()
        cloud = cloud.replace(
            opacity_logits=jnp.full_like(cloud.opacity_logits, 3.0),
            log_scales=cloud.log_scales.at[7].set(jnp.log(0.5)),
        )
        stats = stats_with_grads(cloud, jnp.zeros((cloud.capacity,), bool))
        before, *_ = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 2900, 1.0, CFG
        )
        assert bool(before.alive[7])  # not yet
        after, *_ = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 3000, 1.0, CFG
        )
        assert not bool(after.alive[7])


class TestOpacityReset:
    def test_reset_values_and_moments(self):
        cloud, adam, state = setup()
        new_cloud, new_state = reset_opacity(cloud, state, CFG)
        expected = float(inverse_sigmoid(0.01))
        np.testing.assert_allclose(np.asarray(new_cloud.opacity_logits), expected, rtol=1e-5)
        assert float(jnp.abs(new_state.mu["opacity_logits"]).max()) == 0.0
        assert float(jnp.abs(new_state.nu["opacity_logits"]).max()) == 0.0
        # Other moments untouched.
        assert float(new_state.mu["means"].min()) == 1.0


class TestCapacityOverflow:
    def test_overflow_drops_gracefully(self):
        cloud, adam, state = setup(n=16, cap=17)  # only one free slot
        hot = cloud.alive  # everything hot & small -> wants 16 clones
        cloud = cloud.replace(
            log_scales=jnp.full_like(cloud.log_scales, jnp.log(0.001)),
            opacity_logits=jnp.full_like(cloud.opacity_logits, 3.0),
        )
        stats = stats_with_grads(cloud, hot)
        new_cloud, _, _, info = densify_and_prune(
            cloud, state, stats, jax.random.key(0), 600, 1.0, CFG
        )
        assert int(info["cloned"]) == 1
        assert int(info["dropped_for_capacity"]) == 15
        assert int(new_cloud.n_alive()) == 17


class TestBatchedStats:
    def test_batch_matches_sequential_accumulate(self):
        """accumulate_stats_batch(V views) == V accumulate_stats calls."""
        from splatpu.growth.densify import accumulate_stats_batch

        rng = np.random.default_rng(0)
        cap, V = 32, 4
        grads = jnp.asarray(rng.standard_normal((V, cap, 2)).astype(np.float32))
        radii = jnp.asarray(
            (rng.uniform(0, 6, (V, cap)) * (rng.uniform(size=(V, cap)) > 0.4))
            .astype(np.float32)
        )
        seq = init_stats(cap)
        for v in range(V):
            seq = accumulate_stats(seq, grads[v], radii[v])
        bat = accumulate_stats_batch(init_stats(cap), grads, radii)
        np.testing.assert_allclose(bat.grad_accum, seq.grad_accum, rtol=1e-6)
        np.testing.assert_allclose(bat.vis_count, seq.vis_count)
        np.testing.assert_allclose(bat.max_radii, seq.max_radii)
