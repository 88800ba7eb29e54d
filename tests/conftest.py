"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set platform/flags before jax initializes (SURVEY.md §4 "distributed
tests without a cluster").
"""

import os

# Force CPU regardless of ambient configuration: CI/tests must be
# deterministic and runnable without a TPU. (TPU-specific kernel tests
# opt back in explicitly.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU plugin in some environments ignores JAX_PLATFORMS; the config knob
# always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
