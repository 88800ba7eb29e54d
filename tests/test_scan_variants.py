"""In-kernel lane prefix-scan variants must agree with a sequential cumsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatpu.render import exact


@pytest.mark.parametrize("g", [128, 256, 512])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("inclusive", [False, True])
def test_mxu2_matches_cumsum(g, reverse, inclusive):
    x = np.asarray(
        jax.random.normal(jax.random.key(0), (64, g)), np.float32
    ) * 3.0
    ref = np.cumsum(x[:, ::-1], axis=1)[:, ::-1] if reverse else np.cumsum(x, axis=1)
    if not inclusive:
        ref = ref - x
    got = np.asarray(
        exact._lane_cumsum_mxu2(jnp.asarray(x), inclusive=inclusive, reverse=reverse)
    )
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_mxu_highest_matches_cumsum():
    x = np.asarray(jax.random.normal(jax.random.key(1), (32, 256)), np.float32)
    ref = np.cumsum(x, axis=1)
    got = np.asarray(exact._lane_cumsum_mxu(jnp.asarray(x)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-6)
