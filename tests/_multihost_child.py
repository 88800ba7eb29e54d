"""Child process for the real 2-process jax.distributed test.

Run as: python tests/_multihost_child.py <coordinator_addr> <process_id>
Initializes through splatpu's `initialize_multihost` (the REAL code path, no
monkeypatching), then psums a value across the two processes.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from splatpu.dist.mesh import initialize_multihost  # noqa: E402


def main():
    addr, pid = sys.argv[1], int(sys.argv[2])
    initialize_multihost(
        coordinator_address=addr, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert jax.device_count() == 4  # 2 processes x 2 local CPU devices

    import jax.numpy as jnp

    # psum over the global axis: every device contributes (process_id + 1),
    # so each process sees 2*1 + 2*2 = 6 everywhere.
    local = jnp.full((jax.local_device_count(),), float(pid + 1))
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(local)
    assert float(out[0]) == 6.0, out
    print(f"OK process={pid} psum={float(out[0])}", flush=True)


if __name__ == "__main__":
    main()
