"""Tracing / timing utilities.

The reference has no built-in profiling (SURVEY.md §5: an unused
CUDACHECK macro and external wall-clock scripts); the TPU-native
equivalents are jax.profiler device traces plus a timing harness that is
robust to this platform's async-dispatch pitfalls (see tools/ubench.py
for the full catalog of hazards).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace around a block:

        with profiling.trace("/tmp/trace"):
            W.forward()

    View with TensorBoard / xprof.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x):
    """True device synchronization by one-element host readback.

    On some transports ``jax.block_until_ready`` can return before
    execution completes; reading a value back cannot.
    """
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def time_chained(step, x0, iters: int = 128, reps: int = 3) -> float:
    """Seconds per application of a shape-preserving jittable ``step``,
    measured as a data-chained lax.scan with readback synchronization
    and calibrated readback latency subtracted.  Conservative (iterations
    are dependency-serialized)."""
    rng = np.random.default_rng()

    def body(c, _):
        return step(c), None

    g = jax.jit(lambda a: jax.lax.scan(body, a, None, length=iters)[0])

    def fresh():
        a = x0 * np.float32(rng.uniform(0.5, 2.0))
        device_sync(a)
        return a

    out = g(fresh())
    device_sync(out)
    t0 = time.perf_counter()
    device_sync(out)
    rb = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        a = fresh()
        t0 = time.perf_counter()
        out = g(a)
        device_sync(out)
        times.append(time.perf_counter() - t0)
    return max((float(np.median(times)) - rb) / iters, 1e-12)


def enable_compile_cache(path: str = "~/.cache/pypwt_tpu_xla"):
    """Enable JAX's persistent compilation cache.

    First compilation of a (shape, wavelet, levels) plan costs seconds on
    TPU; the cache makes process restarts free.  Call once before any
    transform."""
    import os
    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return p
