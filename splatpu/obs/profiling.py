"""Profiling and timing harness (SURVEY.md §5.1 — absent in the reference).

- `time_fn`: block_until_ready wall-clock timing with warmup, for kernels and
  train steps.
- `trace`: context manager around `jax.profiler.trace` writing a TensorBoard-
  loadable trace directory.
- `debug_nan_mode`: enables jax_debug_nans (SURVEY.md §5.2) for debugging.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def force_completion(out) -> float:
    """Fetch one element of every array leaf to the host.

    On the axon TPU tunnel, `jax.block_until_ready` returns before execution
    actually finishes; only a host transfer truly synchronizes.  Per-leaf
    element fetches are cheap and wait for the producing executable.
    """
    acc = 0.0
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            acc += float(leaf.ravel()[0].astype("float32"))
    return acc


def observe_completion(out) -> float:
    """Block on completion of everything enqueued so far.

    `block_until_ready` is the real (multi-device-correct) synchronization on
    ordinary backends; on the axon tunnel it returns early, so ONE element of
    ONE leaf is additionally fetched — enough there because single-chip
    executions are FIFO-serialized — at one round-trip (~10-20 ms) instead of
    one per leaf.  Use inside timing loops; use `force_completion` when every
    leaf must actually be materialized."""
    jax.block_until_ready(out)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            return float(leaf.ravel()[0].astype("float32"))
    return 0.0


def time_fn(
    fn: Callable, *args, warmup: int = 2, iters: int = 10, args_fn=None,
    batches: int = 2,
) -> dict:
    """Returns {'mean_ms', 'spread_ms', 'iters'} for fn(*args) with true
    host-observed completion per measurement batch.

    Pass ``args_fn(i) -> tuple`` to give every iteration distinct inputs —
    the axon tunnel memoizes executions on identical inputs, so repeated
    identical launches measure the cache, not the TPU.

    Per-iteration times are unobservable through the tunnel (only a host
    fetch synchronizes, and one fetch costs ~10-20 ms), so iterations are
    split into ``batches`` throughput batches with one fetch each;
    ``spread_ms`` = max - min of the per-batch means quantifies run-to-run
    variance honestly (a `best_ms` statistic cannot be measured here).
    """
    get = args_fn if args_fn is not None else (lambda i: args)
    # Materialize every iteration's inputs BEFORE the clock starts: even a
    # single eager op costs ~10+ ms through the tunnel and would otherwise be
    # timed as part of fn.
    all_inputs = [get(i) for i in range(-(warmup + 1), iters)]
    for a in all_inputs:
        force_completion(a)
    warm_inputs, inputs = all_inputs[: warmup + 1], all_inputs[warmup + 1 :]
    for a in warm_inputs:
        force_completion(fn(*a))
    # Throughput measurement: enqueue each batch's distinct executions and
    # observe completion once per batch.  Executions on a single chip are
    # FIFO-serialized, so elapsed/iters is the true per-call cost with the
    # fetch round-trip (~tens of ms through the tunnel) amortized away.
    batches = max(1, min(batches, iters))
    per = [0] * batches
    for i in range(iters):
        per[i % batches] += 1
    batch_ms = []
    it = iter(inputs)
    for count in per:
        t0 = time.perf_counter()
        out = None
        for _ in range(count):
            out = fn(*next(it))
        observe_completion(out)
        batch_ms.append((time.perf_counter() - t0) * 1000.0 / count)
    return {
        "mean_ms": sum(m * c for m, c in zip(batch_ms, per)) / iters,
        "spread_ms": max(batch_ms) - min(batch_ms),
        "iters": iters,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nan_mode():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
