"""Deformation network, encodings, and rigidity-loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.core.quaternion import quat_normalize
from splatpu.data.synthetic import make_random_cloud
from splatpu.dynamics.deform import (
    encode_progress,
    normalize_and_encode_means_and_rotations,
    update_cloud_parameters,
)
from splatpu.dynamics.network import (
    DeformationNetConfig,
    deformation_net_apply,
    init_deformation_net,
)
from splatpu.dynamics.rigidity import (
    build_neighbor_info,
    foreground_info,
    rigidity_loss,
)

CFG = DeformationNetConfig(hidden_dim=32, residual_blocks=2)


class TestNetwork:
    def test_shapes_and_residual(self):
        key = jax.random.key(0)
        params = init_deformation_net(key, CFG)
        n = 64
        init_mr = jnp.ones((n, 7)) * 5.0
        enc_i = jnp.zeros((n, 92))
        enc_p = jnp.zeros((n, 92))
        enc_t = jnp.zeros((n, 8))
        out = deformation_net_apply(params, init_mr, enc_i, enc_p, enc_t, CFG)
        assert out.shape == (n, 7)
        # The network-level residual (`train.py:108`): output must track the
        # initial means/rotations for a zeroed-out network.
        zeroed = jax.tree.map(jnp.zeros_like, params)
        out0 = deformation_net_apply(zeroed, init_mr, enc_i, enc_p, enc_t, CFG)
        np.testing.assert_allclose(np.asarray(out0), 5.0, atol=1e-5)

    def test_encoding_dims_match_reference(self):
        """PE10(3) + PE4(4) = 92 per state; x2 states + PE4 progress = 192."""
        means = jnp.zeros((10, 3))
        quats = jnp.zeros((10, 4)).at[:, 0].set(1.0)
        means = means.at[0].set(1.0)  # avoid degenerate max
        quats = quats.at[0, 1].set(1.0)
        enc = normalize_and_encode_means_and_rotations(means, quats)
        assert enc.shape == (10, 92)
        prog = encode_progress(3, 10, 10)
        assert prog.shape == (10, 8)
        assert 2 * 92 + 8 == 192

    def test_update_cloud_parameters_double_residual(self):
        """updated = initial + 0.01 * (raw_net + initial) exactly."""
        cloud = make_random_cloud(jax.random.key(1), 32)
        params = init_deformation_net(jax.random.key(2), CFG)
        zeroed = jax.tree.map(jnp.zeros_like, params)
        enc = normalize_and_encode_means_and_rotations(
            cloud.means, cloud.rotation_quaternions
        )
        updated = update_cloud_parameters(
            zeroed, cloud, enc, enc, timestep=1.0, timestep_count=5, config=CFG
        )
        # Zero net -> raw output = 0, residual adds initial -> delta = initial.
        np.testing.assert_allclose(
            np.asarray(updated.means),
            np.asarray(cloud.means * 1.01),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(updated.rotation_quaternions),
            np.asarray(cloud.rotation_quaternions * 1.01),
            rtol=1e-5,
            atol=1e-6,
        )


class TestNormalization:
    def test_minmax_range(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)), jnp.float32)
        from splatpu.dynamics.deform import _minmax_normalize

        n = np.asarray(_minmax_normalize(x))
        np.testing.assert_allclose(n.min(axis=0), -1.0, atol=1e-6)
        np.testing.assert_allclose(n.max(axis=0), 1.0, atol=1e-6)

    def test_masked_stats_ignore_padding(self):
        from splatpu.dynamics.deform import _minmax_normalize

        x = jnp.asarray([[0.0], [1.0], [100.0]])
        mask = jnp.asarray([True, True, False])
        n = np.asarray(_minmax_normalize(x, mask))
        np.testing.assert_allclose(n[:2, 0], [-1.0, 1.0], atol=1e-6)


class TestRigidity:
    def test_zero_for_rigid_motion(self):
        """A global rigid transform of the foreground must give ~zero loss."""
        rng = np.random.default_rng(3)
        f = 40
        # Dense cloud: neighbor distances ~0.02 so exp(-2000 d^2) weights are
        # non-negligible (the regularizer only "sees" tight neighborhoods).
        means = jnp.asarray(rng.normal(size=(f, 3)) * 0.05, jnp.float32)
        quats = quat_normalize(jnp.asarray(rng.normal(size=(f, 4)), jnp.float32))
        info = build_neighbor_info(means, k=5)
        prev = foreground_info(means, quats, info.indices)

        # Apply a global rotation + translation.
        from scipy.spatial.transform import Rotation

        g = Rotation.from_euler("xyz", [20, -10, 35], degrees=True)
        gq = np.roll(g.as_quat(), 1)  # to (w, x, y, z)
        new_means = jnp.asarray(
            (g.as_matrix() @ np.asarray(means).T).T + np.array([0.3, -0.1, 0.2]),
            jnp.float32,
        )
        from splatpu.core.quaternion import quat_mult

        new_quats = quat_mult(jnp.asarray(gq, jnp.float32)[None].repeat(f, 0), quats)
        loss = rigidity_loss(new_means, new_quats, info, prev)
        assert float(loss) < 1e-3

    def test_positive_for_nonrigid_motion(self):
        rng = np.random.default_rng(4)
        f = 40
        means = jnp.asarray(rng.normal(size=(f, 3)) * 0.05, jnp.float32)
        quats = jnp.zeros((f, 4)).at[:, 0].set(1.0)
        info = build_neighbor_info(means, k=5)
        prev = foreground_info(means, quats, info.indices)
        stretched = means * jnp.asarray([2.0, 1.0, 1.0])
        loss = rigidity_loss(stretched, quats, info, prev)
        assert float(loss) > 1e-3

    def test_weights_formula(self):
        means = jnp.asarray(np.random.default_rng(5).normal(size=(20, 3)), jnp.float32)
        info = build_neighbor_info(means, k=3)
        from splatpu.neighbors.knn import knn

        _, d2 = knn(means, 3)
        np.testing.assert_allclose(
            np.asarray(info.weights), np.exp(-2000 * np.asarray(d2)), rtol=1e-4
        )

    def test_neighbor_gather_gradient_routing(self):
        # The scatter-free custom_vjp must match plain-gather autodiff exactly.
        import jax

        from splatpu.dynamics import rigidity as R

        rng = np.random.default_rng(6)
        f, k = 64, 7
        means = jnp.asarray(rng.normal(size=(f, 3)) * 0.1, jnp.float32)
        quats = jnp.zeros((f, 4)).at[:, 0].set(1.0)
        info = build_neighbor_info(means, k=k)
        prev = foreground_info(means, quats, info.indices)

        def loss_new(m):
            return R.rigidity_loss(m, quats, info, prev)

        def loss_plain(m):
            cur_rot = R.quat_normalize(quats, eps=1e-12)
            rel = R.build_rotation(
                R.quat_mult(cur_rot, prev.inverted_rotations), eps=1e-12
            )
            offsets = m[info.indices] - m[:, None]
            in_prev = jnp.einsum("fij,fki->fkj", rel, offsets)
            return R.weighted_l2_loss_v2(
                in_prev, prev.offsets_to_neighbors, info.weights
            )

        m2 = means + 0.01
        np.testing.assert_allclose(
            float(loss_new(m2)), float(loss_plain(m2)), rtol=1e-6
        )
        g_new = np.asarray(jax.grad(loss_new)(m2))
        g_ref = np.asarray(jax.grad(loss_plain)(m2))
        np.testing.assert_allclose(g_new, g_ref, rtol=1e-5, atol=1e-7)
