"""Profiling / tracing helpers.

The reference has no systematic profiling — only unused time.time() captures
(train_nerf.py:228) and tqdm bars (SURVEY.md §5). Here tracing is first-class:
``trace()`` wraps a region in a jax.profiler trace viewable in
TensorBoard/Perfetto/XProf, and ``time_fn`` gives compile-excluded steady-state
timings for jitted functions (the number that matters on TPU).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed region (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside an active trace (shows up in the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    reps: int = 10,
) -> Tuple[float, object]:
    """Steady-state seconds/call for a jitted fn (compile excluded).

    Returns (seconds_per_call, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out
