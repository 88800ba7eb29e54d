"""Golden-value tests for core math: quaternions vs scipy, SSIM vs an
independent scipy implementation, positional-encoding semantics (including the
reference's cos-of-sin quirk, `train.py:125`), and projection geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import convolve2d
from scipy.spatial.transform import Rotation

from splatpu.core.encoding import positional_encoding
from splatpu.core.projection import full_projection_matrix, preprocess
from splatpu.core.quaternion import build_rotation, quat_conjugate, quat_mult, quat_normalize
from splatpu.core.ssim import ssim
from splatpu.core.types import activate_cloud
from splatpu.data.synthetic import make_lookat_camera, make_random_cloud


class TestQuaternion:
    def test_build_rotation_matches_scipy(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(32, 4))
        ours = np.asarray(build_rotation(jnp.asarray(q, jnp.float32)))
        # scipy uses (x, y, z, w) ordering.
        theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quat_mult_matches_scipy(self):
        rng = np.random.default_rng(1)
        q1 = rng.normal(size=(16, 4))
        q2 = rng.normal(size=(16, 4))
        q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        ours = np.asarray(quat_mult(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
        r = Rotation.from_quat(q1[:, [1, 2, 3, 0]]) * Rotation.from_quat(
            q2[:, [1, 2, 3, 0]]
        )
        theirs = r.as_quat()[:, [3, 0, 1, 2]]
        # Quaternion double cover: compare up to sign.
        sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, theirs * sign, atol=1e-5)

    def test_conjugate_inverts_rotation(self):
        q = quat_normalize(jnp.asarray(np.random.default_rng(2).normal(size=(8, 4)), jnp.float32))
        prod = quat_mult(q, quat_conjugate(q))
        expected = jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1))
        np.testing.assert_allclose(np.asarray(prod), np.asarray(expected), atol=1e-5)


class TestSSIM:
    def _reference_ssim(self, a, b):
        """Independent NumPy/scipy SSIM: 11x11 gaussian window sigma=1.5,
        zero-padded, per channel."""
        xs = np.arange(11)
        g = np.exp(-((xs - 5) ** 2) / (2 * 1.5**2))
        g /= g.sum()
        w = np.outer(g, g)
        conv = lambda img: np.stack(
            [convolve2d(img[c], w, mode="same", boundary="fill") for c in range(img.shape[0])]
        )
        mu1, mu2 = conv(a), conv(b)
        s1 = conv(a * a) - mu1**2
        s2 = conv(b * b) - mu2**2
        s12 = conv(a * b) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
        )
        return m.mean()

    def test_matches_independent_implementation(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = self._reference_ssim(a, b)
        assert abs(ours - theirs) < 1e-4

    def test_identical_images(self):
        a = jnp.asarray(np.random.default_rng(4).uniform(size=(3, 16, 16)), jnp.float32)
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.uniform(size=(2, 3, 16, 16)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(2, 3, 16, 16)), jnp.float32)
        per = ssim(a, b, size_average=False)
        assert per.shape == (2,)
        assert float(ssim(a, b)) == pytest.approx(float(per.mean()), abs=1e-6)


class TestPositionalEncoding:
    def test_shape(self):
        x = jnp.zeros((5, 3))
        assert positional_encoding(x, 10).shape == (5, 60)
        assert positional_encoding(jnp.zeros((7, 4)), 4).shape == (7, 32)

    def test_layout_and_quirk(self):
        """out[n, 2j*D + d] = sin(2^j pi x); out[n, (2j+1)*D + d] = cos(sin(.))."""
        rng = np.random.default_rng(6)
        x = rng.uniform(-1, 1, size=(3, 2)).astype(np.float32)
        out = np.asarray(positional_encoding(jnp.asarray(x), 3, quirk_compat=True))
        d = x.shape[1]
        for j in range(3):
            phase = (2.0**j) * np.pi * x
            np.testing.assert_allclose(out[:, 2 * j * d : (2 * j + 1) * d], np.sin(phase), atol=1e-5)
            np.testing.assert_allclose(
                out[:, (2 * j + 1) * d : (2 * j + 2) * d],
                np.cos(np.sin(phase)),
                atol=1e-5,
            )

    def test_correct_mode(self):
        x = jnp.asarray(np.random.default_rng(7).uniform(-1, 1, size=(3, 2)), jnp.float32)
        out = np.asarray(positional_encoding(x, 2, quirk_compat=False))
        phase = np.pi * np.asarray(x)
        np.testing.assert_allclose(out[:, 2:4], np.cos(phase), atol=1e-5)


class TestProjection:
    def test_optical_axis_projects_to_principal_point(self):
        cam = make_lookat_camera(eye=(0, 0, -4), target=(0, 0, 0), width=64, height=48)
        P = np.asarray(full_projection_matrix(cam))
        p = P @ np.array([0.0, 0.0, 0.0, 1.0])
        ndc = p[:2] / p[3]
        px = ((ndc + 1) * np.array([64, 48]) - 1) / 2
        # Principal point at (W/2, H/2) with the CUDA -0.5 pixel convention.
        np.testing.assert_allclose(px, [31.5, 23.5], atol=1e-4)

    def test_known_offset_point(self):
        cam = make_lookat_camera(eye=(0, 0, -4), target=(0, 0, 0), width=64, height=64, focal=60.0)
        # World point at x=+1, z=0 -> view space (1, 0, 4); px = fx*x/z + cx - .5
        P = np.asarray(full_projection_matrix(cam))
        p = P @ np.array([1.0, 0.0, 0.0, 1.0])
        ndc = p[:3] / p[3]
        px = ((ndc[0] + 1) * 64 - 1) / 2
        assert px == pytest.approx(60.0 * 1.0 / 4.0 + 32 - 0.5, abs=1e-3)

    def test_preprocess_visibility_and_radius(self):
        cloud = make_random_cloud(jax.random.key(0), 64)
        cam = make_lookat_camera(eye=(0, 0, -4), width=64, height=64)
        sp = preprocess(activate_cloud(cloud), cam)
        vis = np.asarray(sp.visible)
        assert vis.any()
        r = np.asarray(sp.radius)
        assert (r[vis] > 0).all()
        assert (r[~vis] == 0).all()
        # Behind-camera points are culled.
        behind = cloud.replace(means=cloud.means.at[:, 2].add(-100.0))
        sp2 = preprocess(activate_cloud(behind), cam)
        assert not np.asarray(sp2.visible).any()
