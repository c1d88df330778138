"""Honest device timing on the axon-tunneled TPU.

Platform behaviors that make naive timing lie (all observed here):

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
subtracted.  Throughput-style measurement of independent dispatches is
not reliably possible here; chained timing is a conservative
(dependency-serialized) lower bound on throughput.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

# Unique values per run: the execution cache persists across processes.
_rng = np.random.default_rng()


def make_inputs(shape, n=1, dtype=np.float32):
    return [jnp.asarray(_rng.random(shape, dtype=dtype)) for _ in range(n)]


def _sync(x):
    """True device synchronization: read one element back to host."""
    return float(jnp.ravel(x)[0])


def readback_latency(x, reps=3):
    """Calibrate the D2H one-element readback cost."""
    _sync(x)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(x)
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
        _sync(jax.tree_util.tree_leaves(a)[0])
        return a

    g = make(iters)
    out = g(fresh())
    _sync(jax.tree_util.tree_leaves(out)[0])   # compile + drain
    rb = readback_latency(jax.tree_util.tree_leaves(out)[0])

    # adapt: one region should take >= 20x the readback latency
    for _ in range(6):
        a = fresh()
        t0 = time.perf_counter()
        out = g(a)
        _sync(jax.tree_util.tree_leaves(out)[0])
        region = time.perf_counter() - t0
        if region >= 20.0 * rb or iters >= 1 << 16:
            break
        scale = max(2, int(20.0 * rb / max(region - rb, rb / 4)))
        iters = min(iters * scale, 1 << 16)
        g = make(iters)
        out = g(fresh())
        _sync(jax.tree_util.tree_leaves(out)[0])

    times = []
    for _ in range(reps):
        a = fresh()
        t0 = time.perf_counter()
        out = g(a)
        _sync(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    t = (float(np.median(times)) - rb) / iters
    t = max(t, 1e-12)
    if return_overhead:
        return t, rb
    return t


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
