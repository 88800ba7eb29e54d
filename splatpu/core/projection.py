"""Camera projection and EWA splatting math (vectorized over Gaussians).

This is the TPU-native equivalent of the CUDA rasterizer's per-Gaussian
"preprocess" stage (SURVEY.md §2.1 step 1, reconstructed from the
`diff-gaussian-rasterization-w-depth` fork used at reference `train.py:16` /
`densify.py:9`) plus the projection-matrix construction of reference
`shared.py:64-124`:

- full projection = OpenGL-style perspective (principal-point aware,
  near/far as at `shared.py:81-111`) composed with the world-to-camera matrix;
- pixel coords via NDC with the CUDA kernel's `ndc2Pix` convention
  (px = ((ndc+1)*W - 1)/2, i.e. fx*x/z + cx - 0.5);
- 3D covariance R·diag(s^2)·R^T, EWA Jacobian with 1.3*tanfov frustum clamp,
  +0.3 pixel low-pass dilation on the 2D covariance diagonal;
- conic (inverse 2D covariance), screen radius = ceil(3*sqrt(lambda_max)).

Everything is pure jnp with static shapes, so XLA fuses it into a single
elementwise kernel over the (padded) Gaussian capacity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from splatpu.core.quaternion import build_rotation
from splatpu.core.types import Camera, RenderArgs

# CUDA kernel constants [reconstructed], kept for numerical parity.
NEAR_CULL_Z = 0.2           # view-space z below which Gaussians are culled
COV2D_DILATION = 0.3        # low-pass filter added to 2D covariance diagonal
RADIUS_SIGMA = 3.0          # screen radius = ceil(3 sigma)
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4


def opengl_projection_matrix(camera: Camera) -> jax.Array:
    """The principal-point-aware perspective matrix of `shared.py:81-111`
    (stored here in ordinary row-major math convention, applied as P @ x)."""
    w, h = camera.width, camera.height
    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy
    n, f = camera.near, camera.far
    z = jnp.zeros(())
    return jnp.array(
        [
            [2 * fx / w, z, -(w - 2 * cx) / w, z],
            [z, 2 * fy / h, -(h - 2 * cy) / h, z],
            [z, z, f / (f - n), -(f * n) / (f - n)],
            [z, z, jnp.ones(()), z],
        ]
    )


def full_projection_matrix(camera: Camera) -> jax.Array:
    """projmatrix = P_opengl @ w2c (`shared.py:120` composes the same product in
    transposed row-vector convention)."""
    return opengl_projection_matrix(camera) @ camera.w2c


@struct.dataclass
class Splats2D:
    """Per-Gaussian screen-space quantities produced by preprocessing."""

    mean2d: jax.Array    # (N, 2) pixel coordinates
    depth: jax.Array     # (N,) view-space z
    conic: jax.Array     # (N, 3) inverse 2D covariance (a, b, c) for [[a,b],[b,c]]
    radius: jax.Array    # (N,) float screen radius (0 => culled)
    visible: jax.Array   # (N,) bool — in frustum, positive-definite cov, radius>0


def _rotation_columns(rotations, eps=1e-12):
    """Rotation-matrix entries as nine (N,) columns R[i][j].

    TPU-layout note: (N, 3, 3) arrays pad their minor dims to (8, 128) tiles —
    a ~100x memory blowup — so preprocess never materializes matrix-shaped
    intermediates; everything stays (N,) columns that XLA fuses freely.
    """
    from splatpu.core.quaternion import quat_normalize

    q = quat_normalize(rotations, eps=eps)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ]


def compute_cov3d_columns(scales, rotations):
    """Sigma = R diag(s^2) R^T as a 3x3 nest of (N,) columns."""
    R = _rotation_columns(rotations)
    s = [scales[:, 0], scales[:, 1], scales[:, 2]]
    RS = [[R[i][k] * s[k] for k in range(3)] for i in range(3)]
    return [
        [sum(RS[i][k] * RS[j][k] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def compute_cov3d(scales: jax.Array, rotations: jax.Array) -> jax.Array:
    """Sigma = R diag(s^2) R^T, returned as (N, 3, 3) (tests/debug only —
    the hot path uses `compute_cov3d_columns`)."""
    cols = compute_cov3d_columns(scales, rotations)
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in cols], axis=-2
    )


def preprocess(args: RenderArgs, camera: Camera) -> Splats2D:
    """Project Gaussians to screen space (SURVEY §2.1 step 1)."""
    means = args.means3d
    n = means.shape[0]

    # View-space positions (unrolled mat-vec: stays elementwise/fused, exact f32).
    Rw = camera.w2c[:3, :3]
    tw = camera.w2c[:3, 3]

    def matvec_rows(M, v3, bias):  # (R, 3) @ (N, 3)^T + (R,) -> (N, R)
        return jnp.stack(
            [
                v3[:, 0] * M[r, 0] + v3[:, 1] * M[r, 1] + v3[:, 2] * M[r, 2] + bias[r]
                for r in range(M.shape[0])
            ],
            axis=-1,
        )

    p_view = matvec_rows(Rw, means, tw)  # (N, 3)
    tz = p_view[:, 2]
    in_front = tz > NEAR_CULL_Z

    # Clip-space -> NDC -> pixels (ndc2Pix convention).
    P = full_projection_matrix(camera)
    p_hom = matvec_rows(P[:, :3], means, P[:, 3])  # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :2] * p_w[:, None]
    # means2d_offset is an additive zero in NDC units; its cotangent is the
    # screen-space gradient collector (reference `shared.py:38-41` means2D dummy,
    # consumed at `external.py:113-124`). NDC -> pixel scale = (W/2, H/2), which
    # reproduces the CUDA backward's ddelx_dx = 0.5*W convention.
    ndc = ndc + args.means2d_offset
    wh = jnp.array([camera.width, camera.height], jnp.float32)
    mean2d = ((ndc + 1.0) * wh - 1.0) * 0.5

    # EWA: 2D covariance (all (N,) columns; see _rotation_columns layout note).
    cov3d = compute_cov3d_columns(args.scales, args.rotations)
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    tz_safe = jnp.where(tz == 0.0, 1e-6, tz)
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J: per-Gaussian 2x3 perspective Jacobian rows, kept as columns of
    # elementwise arrays; all products below are unrolled so the whole EWA
    # stage fuses into one VPU kernel (batched tiny matmuls would not).
    J_rows = [
        [fx * inv_z, zeros, -fx * tx * inv_z2],
        [zeros, fy * inv_z, -fy * ty * inv_z2],
    ]
    # JW[a][b] = sum_k J[a][k] * Rw[k, b]   -> (N,) each
    JW = [
        [sum(J_rows[r][k] * Rw[k, b] for k in range(3)) for b in range(3)]
        for r in range(2)
    ]
    # cov2d[r][c] = sum_{k,l} JW[r][k] * cov3d[k][l] * JW[c][l]
    def cov2d_entry(r, c_):
        acc = 0.0
        for k in range(3):
            tmp = sum(cov3d[k][l] * JW[c_][l] for l in range(3))
            acc = acc + JW[r][k] * tmp
        return acc

    a = cov2d_entry(0, 0) + COV2D_DILATION
    b = cov2d_entry(0, 1)
    c = cov2d_entry(1, 1) + COV2D_DILATION

    det = a * c - b * b
    det_valid = det > 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(lambda_max))

    visible = in_front & det_valid & (radius > 0.0) & (args.opacities[:, 0] > 0.0)
    radius = jnp.where(visible, radius, 0.0)
    return Splats2D(
        mean2d=mean2d, depth=tz, conic=conic, radius=radius, visible=visible
    )


def tile_rect(mean2d, radius, tiles_x: int, tiles_y: int, tile: int = 16):
    """Covered-tile rectangle per Gaussian (CUDA getRect [reconstructed]):
    returns (tx0, ty0, tx1, ty1) with half-open [tx0, tx1) x [ty0, ty1).

    The render kernel only composites a Gaussian into tiles inside this rect,
    even where the analytic alpha would still clear the 1/255 cutoff — an
    intentional part of the contract that every renderer here reproduces.
    """
    x, y = mean2d[:, 0], mean2d[:, 1]
    tx0 = jnp.clip(jnp.floor((x - radius) / tile).astype(jnp.int32), 0, tiles_x)
    ty0 = jnp.clip(jnp.floor((y - radius) / tile).astype(jnp.int32), 0, tiles_y)
    tx1 = jnp.clip(jnp.floor((x + radius) / tile).astype(jnp.int32) + 1, 0, tiles_x)
    ty1 = jnp.clip(jnp.floor((y + radius) / tile).astype(jnp.int32) + 1, 0, tiles_y)
    return tx0, ty0, tx1, ty1


def evaluate_alpha(conic_a, conic_b, conic_c, opacity, dx, dy):
    """Gaussian falloff alpha at pixel offsets (dx, dy) from the splat center.

    All arguments broadcast together. Applies the CUDA render kernel's clamps
    [reconstructed]: alpha = 0 where power > 0 or alpha < 1/255, else
    min(0.99, opacity * exp(power)).
    """
    power = -0.5 * (conic_a * dx * dx + conic_c * dy * dy) - conic_b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(keep, alpha, 0.0)
