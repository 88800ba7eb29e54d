"""Quaternion and rotation math (pure jnp, batch-first).

Semantics match the reference's `external.py:27-46` (`build_rotation`) and
`train.py:311-318` (`quat_mult`); quaternions are (w, x, y, z), Hamilton product.
"""

import jax.numpy as jnp


def quat_normalize(q, eps: float = 0.0):
    """L2-normalize quaternions along the last axis.

    With ``eps=0`` this matches `torch.nn.functional.normalize`'s behavior only
    for nonzero quaternions; pass a small eps for padded/dead slots.
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return q / norm


def quat_conjugate(q):
    """(w, x, y, z) -> (w, -x, -y, -z); the inverse for unit quaternions.

    Reference `train.py:220-225` negates the vector part in-place.
    """
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mult(q1, q2):
    """Hamilton product, batched over leading axes (`train.py:311-318`)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def build_rotation(q, eps: float = 0.0):
    """Unit-normalize then convert quaternions to 3x3 rotation matrices.

    Matches `external.py:27-46` exactly (normalize first, then the standard
    quat->R formula). Batched over leading axes: (..., 4) -> (..., 3, 3).
    """
    q = quat_normalize(q, eps=eps)
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)
