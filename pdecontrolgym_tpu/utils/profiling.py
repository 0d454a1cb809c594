"""Profiling / timing helpers.

The reference's only timing artifact is ``time.time()`` + tqdm wall-clock in
``NS2Doptimization.py:72-73``. Here: an honest device-throughput meter (forces
a host readback — ``block_until_ready`` can return before remote execution
completes over tunneled PJRT backends) and a jax.profiler trace context.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def time_device_fn(fn: Callable, *args, repeats: int = 3) -> float:
    """Best wall-clock seconds for ``fn(*args)``; the result pytree is reduced
    to one scalar on device and read back so the measurement covers the full
    remote execution. Compiles/warms on the first (untimed) call."""

    def scalarize(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x) for x in leaves if hasattr(x, "dtype"))

    g = jax.jit(scalarize)
    float(np.asarray(g(*args)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(g(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def steps_per_second(fn: Callable, steps: int, *args, repeats: int = 3) -> float:
    """Throughput of a rollout-like fn that advances ``steps`` env-steps."""
    return steps / time_device_fn(fn, *args, repeats=repeats)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context for inspecting programs in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
