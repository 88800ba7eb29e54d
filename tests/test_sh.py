"""SH color evaluation oracle tests (eval-only surface; the reference call
sites fix sh_degree=0, `/root/reference/shared.py:32,121`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatpu.core.sh import eval_sh_colors, num_sh_coeffs, sh_basis


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def test_basis_orthonormal_montecarlo():
    """Real SH bands must be orthonormal over the sphere: MC-integrate
    basis_i * basis_j with uniform sphere samples -> ~identity."""
    dirs = _random_dirs(200_000)
    b = np.asarray(sh_basis(jnp.asarray(dirs), 3), np.float64)  # (M, 16)
    gram = (b.T @ b) / len(dirs) * 4.0 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_degree0_matches_precomp_convention():
    """Degree-0 SH is the colors_precomp convention: C0*coef + 0.5."""
    rng = np.random.default_rng(1)
    coeffs = jnp.asarray(rng.standard_normal((64, 1, 3)), jnp.float32)
    means = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    out = eval_sh_colors(coeffs, means, jnp.zeros(3))
    expect = np.maximum(0.28209479177387814 * np.asarray(coeffs)[:, 0] + 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6, atol=1e-6)


def test_degree0_is_view_independent_higher_is_not():
    rng = np.random.default_rng(2)
    means = jnp.asarray(rng.standard_normal((32, 3)) * 3, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((32, 1, 3)), jnp.float32)
    a = eval_sh_colors(c0, means, jnp.asarray([5.0, 0.0, 0.0]))
    b = eval_sh_colors(c0, means, jnp.asarray([0.0, 5.0, 0.0]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    c3 = jnp.asarray(rng.standard_normal((32, 16, 3)), jnp.float32)
    a = eval_sh_colors(c3, means, jnp.asarray([5.0, 0.0, 0.0]))
    b = eval_sh_colors(c3, means, jnp.asarray([0.0, 5.0, 0.0]))
    assert float(jnp.abs(a - b).max()) > 1e-3


def test_linearity_in_coeffs():
    """Pre-clamp the evaluation is linear: with coefficients small enough
    that the +0.5 offset keeps everything positive (clamp inactive),
    eval(c1 + c2) == eval(c1) + eval(c2) - 0.5."""
    rng = np.random.default_rng(3)
    means = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    cam = jnp.asarray([0.0, 0.0, 4.0])
    c1 = jnp.asarray(rng.standard_normal((16, 9, 3)) * 0.02, jnp.float32)
    c2 = jnp.asarray(rng.standard_normal((16, 9, 3)) * 0.02, jnp.float32)
    lhs = eval_sh_colors(c1 + c2, means, cam)
    rhs = eval_sh_colors(c1, means, cam) + eval_sh_colors(c2, means, cam) - 0.5
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-5, atol=1e-6)


def test_bad_degree_raises():
    with pytest.raises(ValueError):
        sh_basis(jnp.zeros((4, 3)), 4)
    with pytest.raises(ValueError):
        eval_sh_colors(jnp.zeros((4, 5, 3)), jnp.zeros((4, 3)), jnp.zeros(3))


def test_renders_through_colors_argument():
    """SH colors feed the normal render path via activate_cloud(colors=...)."""
    from splatpu.core.types import activate_cloud
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import render

    cloud = make_random_cloud(jax.random.key(0), 128, extent=0.6)
    cam = make_lookat_camera(eye=(0.0, 0.0, 3.0), width=64, height=64, focal=64.0)
    rng = np.random.default_rng(4)
    coeffs = jnp.asarray(rng.standard_normal((128, 4, 3)) * 0.2, jnp.float32)
    cam_center = -np.asarray(cam.w2c)[:3, :3].T @ np.asarray(cam.w2c)[:3, 3]
    cols = eval_sh_colors(coeffs, cloud.means, jnp.asarray(cam_center, jnp.float32))
    out = render(activate_cloud(cloud, colors=jnp.clip(cols, 0.0, 1.0)), cam)
    img = np.asarray(out.image)
    assert img.shape[0] == 3 and np.isfinite(img).all()


def test_num_coeffs():
    assert [num_sh_coeffs(d) for d in range(4)] == [1, 4, 9, 16]
