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
    # 32 MiB: the round-3 default of 24 MiB (set "comfortably above" the
    # ~19.2 MiB the pathological schedule asked for then) became
    # insufficient again in round 4 at the config-3 shape (41k cloud,
    # 393k-pair budget, 5 vmapped views) — the compile succeeded but the
    # schedule overcommitted at RUNTIME and repeatedly CRASHED the TPU
    # worker on the first training step ("TPU backend error (Internal)" /
    # "worker process crashed or restarted").  32 MiB runs that shape
    # stably; a 48 MiB limit once overcommitted alongside the kernels'
    # 100 MiB budget and also crashed the worker, so do not raise this
    # blindly — use SPLATPU_SCOPED_VMEM_KIB per run.
    kib = int(os.environ.get("SPLATPU_SCOPED_VMEM_KIB", 32 * 1024))
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
