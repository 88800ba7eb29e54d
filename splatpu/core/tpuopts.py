"""Per-jit TPU compiler options.

Works around an XLA scoped-vmem scheduling pathology: at mid-sized pair
budgets (records table ~10 MB/view, e.g. capacity 40960 -> max_pairs 163840)
the multi-view vmapped backward composite gets its pair-gradient buffer
scheduled into scoped VMEM and exceeds the default 16 MiB limit with
"Scoped allocation ... exceeded scoped vmem limit ... It should not be
possible to run out of scoped vmem - please file a bug against XLA."
(observed on v5e, jax 0.9.0).  Raising the limit per-executable fixes it;
the option travels in the compile-options proto, so it also works through
remote-compile tunnels that override ambient XLA_FLAGS.

Passed via ``jax.jit(..., compiler_options=...)`` only when compiling for
TPU — the CPU client's flag parser rejects TPU-only flags fatally.
"""

import os

import jax


def train_step_compiler_options():
    """Compiler options for the big fwd+bwd training-step executables
    (None off-TPU)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    # 24 MiB: comfortably above the ~19.2 MiB the pathological schedule asks
    # for, while keeping scoped + Mosaic kernel VMEM within the chip's 128 MiB
    # (a 48 MiB limit overcommitted alongside the kernels' 100 MiB budget and
    # coincided with a TPU worker crash during a subsequent render).
    kib = int(os.environ.get("SPLATPU_SCOPED_VMEM_KIB", 24 * 1024))
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
