"""Profiling helpers.

The reference has no performance tooling at all (SURVEY.md §5: wall-clock
``import time`` in notebooks only). Here: jax.profiler trace capture and a
simple steps/sec timer for jitted step functions.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard/XProf trace of the enclosed computation."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steps_per_sec(step_fn, carry, steps: int = 20, warmup: int = 3):
    """Time a jitted ``carry = step_fn(carry)`` loop; returns (steps/sec,
    final carry). ``carry``'s leaves are blocked on between timings."""
    for _ in range(warmup):
        carry = step_fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = step_fn(carry)
    jax.block_until_ready(carry)
    return steps / (time.perf_counter() - t0), carry
