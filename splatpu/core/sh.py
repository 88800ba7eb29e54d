"""Spherical-harmonics color evaluation (degrees 0-3), eval-only.

The reference's rasterizer call sites fix ``sh_degree=0`` and pass
``colors_precomp`` (`/root/reference/shared.py:32,121`), so SH never runs in
its pipeline; the underlying CUDA rasterizer API nevertheless advertises SH
up to degree 3.  This module closes that surface: a cloud carrying SH
coefficients can be converted to per-Gaussian view-dependent RGB in
preprocess (one small batched matmul — VPU/MXU friendly, fuses into the
existing preprocess) and rendered through the normal ``colors`` argument.

Convention matches the standard real-SH constants used by the 3DGS family
(band constants C0..C3; direction = normalize(mean - camera_center); output
= sum_k coeffs[k] * basis_k(dir) + 0.5, clamped at 0).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis values for unit directions.

    dirs: (N, 3) unit vectors -> (N, (degree+1)^2) basis values, ordered
    band-major exactly like the 3DGS coefficient layout.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"sh degree must be in [0, 3], got {degree}")
    n = dirs.shape[0]
    cols = [jnp.full((n,), SH_C0, dirs.dtype)]
    if degree >= 1:
        x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        cols += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(cols, axis=1)


def eval_sh_colors(
    coeffs: jnp.ndarray,        # (N, K, 3) with K = (degree+1)^2
    means: jnp.ndarray,         # (N, 3)
    camera_center: jnp.ndarray,  # (3,)
    degree: int | None = None,
) -> jnp.ndarray:
    """View-dependent RGB from SH coefficients: (N, 3), >= 0.

    One (N, K) x (N, K, 3) contraction — batched elementwise-multiply-reduce
    the VPU eats; no per-Gaussian control flow.
    """
    if degree is None:
        degree = int(round(coeffs.shape[1] ** 0.5)) - 1
    if num_sh_coeffs(degree) != coeffs.shape[1]:
        raise ValueError(
            f"coeffs K={coeffs.shape[1]} does not match degree {degree}"
        )
    d = means - camera_center[None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    basis = sh_basis(d, degree)                       # (N, K)
    rgb = jnp.einsum("nk,nkc->nc", basis, coeffs) + 0.5
    return jnp.maximum(rgb, 0.0)
