"""Differenced two-run-length timing for the axon TPU tunnel.

The tunnel dispatches asynchronously and `block_until_ready` returns before
remote execution finishes, so wall-clock timing is only valid when a scalar
host fetch terminates the chain — and fixed dispatch/fetch overhead is
cancelled by differencing two run lengths (CLAUDE.md environment gotchas).
Shared by the probe scripts; bench.py keeps its own train-step variant.
"""
from __future__ import annotations

import time


def measure_differenced(fn, n1: int = 3, n2: int = 13, warmup: int = 2):
    """Median-free single estimate: ((time of n2 calls) - (time of n1 calls))
    / (n2 - n1), each run ending with a scalar host fetch of fn's result."""
    import jax.numpy as jnp

    def run(k):
        r = None
        t0 = time.perf_counter()
        for _ in range(k):
            r = fn()
        _ = float(jnp.sum(r))      # scalar host fetch forces the chain
        return time.perf_counter() - t0

    run(warmup)
    return (run(n2) - run(n1)) / (n2 - n1)


def measure_median(fn, reps: int = 3, **kwargs) -> float:
    """Median of `reps` differenced measurements (seconds per call)."""
    ts = sorted(measure_differenced(fn, **kwargs) for _ in range(reps))
    return ts[len(ts) // 2]
