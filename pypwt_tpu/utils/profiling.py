"""Tracing / timing utilities — the single trusted timing implementation.

The reference has no built-in profiling (SURVEY.md §5: an unused
CUDACHECK macro and external wall-clock scripts); the TPU-native
equivalents are jax.profiler device traces plus a timing harness that is
robust to this platform's async-dispatch pitfalls:

1. ``jax.block_until_ready`` DOES NOT WAIT on this platform — it returns
   in microseconds while the device is still executing.  The only true
   synchronization is a device-to-host readback (which itself costs
   ~35 ms through the tunnel).
2. Executions can be served from a results cache keyed on input contents,
   persisting across processes: timed inputs must be value-unique per run
   (OS-seeded RNG, not fixed seeds).
3. Inside jit, loop-invariant computation is hoisted out of ``lax.scan``:
   the scanned body must depend on the carry.

``timeit_chained`` is the measurement primitive: a long lax.scan whose
carry is the data (defeats 2 and 3), timed together with a one-element
readback (defeats 1), with the readback latency calibrated and
subtracted, and the scan length grown adaptively until a region dwarfs
the readback jitter.  Throughput-style measurement of independent
dispatches is not reliably possible here; chained timing is a
conservative (dependency-serialized) lower bound on throughput.

``tools/ubench.py`` and ``bench.py`` import from here — keep exactly one
copy of this protocol.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp

# Unique values per run: the execution cache persists across processes.
_rng = np.random.default_rng()


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


def make_inputs(shape, n=1, dtype=np.float32):
    """Value-unique device inputs (defeats the cross-process result
    cache)."""
    return [jnp.asarray(_rng.random(shape, dtype=dtype)) for _ in range(n)]


def readback_latency(x, reps=3):
    """Calibrate the D2H one-element readback cost."""
    device_sync(x)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timeit_chained(step, x0, iters=128, reps=3, return_overhead=False):
    """Seconds per application of a shape-preserving ``step``.

    Runs dependent applications inside one jitted scan, syncs by host
    readback, subtracts the calibrated readback latency, and returns the
    median over ``reps`` regions (after one discarded drain region).  The
    scan length grows until the region dwarfs the readback jitter, so
    fast ops on small shapes are measured accurately too.
    """
    def make(n):
        def body(c, _):
            return step(c), None
        return jax.jit(
            lambda a: jax.lax.scan(body, a, None, length=n)[0])

    def fresh():
        bump = np.float32(_rng.uniform(0.5, 2.0))
        a = jax.tree_util.tree_map(lambda t: t * bump, x0)
        device_sync(jax.tree_util.tree_leaves(a)[0])
        return a

    g = make(iters)
    out = g(fresh())
    device_sync(jax.tree_util.tree_leaves(out)[0])   # compile + drain
    rb = readback_latency(jax.tree_util.tree_leaves(out)[0])

    # adapt: one region should take >= 20x the readback latency
    for _ in range(6):
        a = fresh()
        t0 = time.perf_counter()
        out = g(a)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        region = time.perf_counter() - t0
        if region >= 20.0 * rb or iters >= 1 << 16:
            break
        scale = max(2, int(20.0 * rb / max(region - rb, rb / 4)))
        iters = min(iters * scale, 1 << 16)
        g = make(iters)
        out = g(fresh())
        device_sync(jax.tree_util.tree_leaves(out)[0])

    times = []
    for _ in range(reps):
        a = fresh()
        t0 = time.perf_counter()
        out = g(a)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    t = (float(np.median(times)) - rb) / iters
    t = max(t, 1e-12)
    if return_overhead:
        return t, rb
    return t


# Alias kept for existing callers; same hardened implementation.
time_chained = timeit_chained


def timeit_pipelined(step, x0, k=4, iters=64, reps=3):
    """Amortized seconds per application of ``step`` when ``k``
    INDEPENDENT chains are interleaved in one scan.

    ``timeit_chained`` serializes iterations through a data dependency —
    a conservative lower bound on throughput.  Here the scan carry is a
    tuple of k value-unique trees and the body advances each one, so the
    scheduler may overlap chain i's HBM traffic with chain j's compute;
    the amortized time bounds the *pipelined* throughput a streaming user
    (e.g. tomography) gets.  pipelined ≈ chained means dispatch already
    saturates the chip; pipelined ≪ chained means the chained headline
    undersells it.  All the chained protocol's hazard defenses apply
    unchanged (per-chain unique values, readback sync, calibration).
    """
    xs = tuple(
        jax.tree_util.tree_map(
            lambda t: t * np.float32(_rng.uniform(0.5, 2.0)), x0)
        for _ in range(max(2, int(k))))

    def stepk(cs):
        return tuple(step(c) for c in cs)

    t = timeit_chained(stepk, xs, iters=iters, reps=reps)
    return t / len(xs)


def timeit(fn, x0, iters=128, reps=3, shape_adapter=None):
    """Time ``fn`` whose output shape differs from its input: chain through
    ``shape_adapter(out, x_prev) -> next input`` (default: broadcast-add of
    a scalar derived from the output, keeping the carry shape)."""
    if shape_adapter is None:
        def shape_adapter(out, x_prev):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x_prev + jnp.ravel(leaf)[0] * np.float32(1e-12)

    def step(c):
        return shape_adapter(fn(c), c)

    return timeit_chained(step, x0, iters=iters, reps=reps)


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
