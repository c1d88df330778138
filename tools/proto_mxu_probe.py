"""Probe: MXU dot rates + precision inside Pallas on the axon TPU.

Measures small banded-style dots (M~128, K=128/256, N=2048) chained at
pipeline level, and checks f32 dot precision (DEFAULT vs HIGHEST) against
a float64 reference.  One-off exploration tool for the MXU kernel design.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pypwt_tpu.utils.profiling import timeit_chained, make_inputs

print("backend:", jax.default_backend(), jax.devices())


def bench_dot_kernel(M, K, N, n_dots, precision):
    """One grid program doing n_dots dependent (M,K)@(K,N) dots."""
    def kern(d_ref, x_ref, o_ref):
        acc = x_ref[:M, :]
        for _ in range(n_dots):
            acc = jax.lax.dot(d_ref[:, :], acc[:K, :] if K <= M else
                              jnp.concatenate([acc] * (K // M), axis=0),
                              precision=precision,
                              preferred_element_type=jnp.float32)
        o_ref[:, :] = acc

    assert K % M == 0 or K <= M
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call


def run_rate(M, K, N, n_dots, precision, tag):
    call = bench_dot_kernel(M, K, N, n_dots, precision)
    d = make_inputs((M, K))[0] * 0.01
    x0 = make_inputs((max(M, K), N))[0]

    def step(x):
        return call(d, x) * 1.0 + x[:M, :] * 1e-6 if False else call(d, x)

    # shape-preserving: output (M, N); feed back only if M==input rows
    if M == x0.shape[0]:
        t = timeit_chained(lambda c: call(d, c), x0, iters=64)
    else:
        def stepf(c):
            y = call(d, c)
            return c + jnp.pad(y, ((0, c.shape[0] - M), (0, 0))) * 1e-9
        t = timeit_chained(stepf, x0, iters=64)
    fl = 2 * M * K * N * n_dots
    print(f"{tag}: {t*1e6:8.2f} us/call  {n_dots} dots "
          f"-> {fl/t/1e12:6.1f} TFLOP/s nominal")
    return t


def precision_check():
    rng = np.random.default_rng()
    M, K, N = 128, 128, 2048
    d = (rng.random((M, K)) - 0.5).astype(np.float32) * 0.3
    x = (rng.random((K, N)) * 255).astype(np.float32)
    ref = (d.astype(np.float64) @ x.astype(np.float64))

    for prec in ("default", "highest"):
        p = (jax.lax.Precision.DEFAULT if prec == "default"
             else jax.lax.Precision.HIGHEST)

        def kern(d_ref, x_ref, o_ref, p=p):
            o_ref[:, :] = jax.lax.dot(d_ref[:, :], x_ref[:, :], precision=p,
                                      preferred_element_type=jnp.float32)
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )
        y = np.asarray(jax.jit(call)(d, x))
        err = np.abs(y - ref).max()
        rel = err / np.abs(ref).max()
        print(f"dot precision={prec}: max abs err {err:.3e} rel {rel:.3e}")


if __name__ == "__main__":
    precision_check()
    for prec, ptag in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                       (jax.lax.Precision.DEFAULT, "DEFAULT")):
        # banded-analysis-like: M=128 out, K=128, N=2048, chained dots
        run_rate(128, 128, 2048, 8, prec, f"{ptag} M128 K128 N2048 x8")
        run_rate(256, 256, 2048, 8, prec, f"{ptag} M256 K256 N2048 x8")
