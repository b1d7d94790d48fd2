"""Profiling utilities: jax.profiler trace capture + per-step timing.

The reference has no profiling at all (SURVEY §5 — only tqdm bars); here
trace capture is a first-class hook, and rays/sec/chip (the north-star
metric) is measured by the training loop with fetch-forced timing.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing that forces device completion via a scalar fetch —
    required under async dispatch (the axon tunnel returns from
    block_until_ready before remote execution finishes)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._count = 0

    def tick(self, n: int = 1):
        self._count += n

    def rate(self, sync_value=None) -> float:
        """Items/sec since the last reset; pass a device scalar to force
        completion of the pending chain first."""
        if sync_value is not None:
            float(sync_value)
        dt = time.perf_counter() - self._t0
        return self._count / dt if dt > 0 else 0.0


def timeit_differenced(fn, *args, n1: int = 5, n2: int = 25) -> float:
    """Per-call seconds of `fn(*args)` via differenced two-run-length timing.

    Each run length ends with a scalar host fetch (forcing the async chain —
    the axon tunnel's block_until_ready returns before remote execution
    finishes) and the (n2 - n1) difference cancels the fixed dispatch + fetch
    overhead. Shared by the kernel micro-benchmarks (scripts/bench_kernel.py,
    scripts/probe_kernel.py); bench.py uses the same protocol over training
    states."""
    import jax

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    run(2)  # warmup: compile + fetch path
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)
