"""Device profiling helpers.

The reference's profiling story is ad-hoc cProfile dumps and per-drop
wall-clock prints (SURVEY.md §5). Here: a context manager around
``jax.profiler`` emitting a TensorBoard-loadable trace, plus a
dispatch-timing helper that forces completion (the axon remote platform
acknowledges dispatches asynchronously, so plain ``block_until_ready``
under-reports — fetch a scalar to force the full pipeline).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace for everything inside the block.

    View with: tensorboard --logdir LOGDIR (or xprof).
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_scalar(fn, *args, iters: int = 5, warmup: int = 1):
    """Steady-state ms/call of ``fn`` (must return a jax scalar).

    Fetching the scalar forces device completion — reliable under
    remote/async dispatch where block_until_ready returns early.
    """
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000.0
