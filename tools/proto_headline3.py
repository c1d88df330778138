"""Headline #3: tap-cost split + MXU dot-algorithm race.

  haar_pair_2048     VPU 2-tap structure cost (lower bound of VPU design)
  db2_mxu_pair_2048  current MXU (HIGHEST = 6 bf16 passes)
  dot algo race      DEFAULT / X3 / X6 / HIGHEST banded dots in pallas:
                     compile?, abs error vs f64, time for level-0-like work
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pypwt_tpu.core import conv, dwt
from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.ops import pallas_dwt as pk
from pypwt_tpu.ops import mxu_dwt as mx
from pypwt_tpu.utils.profiling import (timeit_chained, make_inputs,
                                       enable_compile_cache)

enable_compile_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir, ".jax_cache_tpu"))

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
      flush=True)


def report(name, secs, extra=""):
    print(f"{name:44s} {secs*1e6:8.1f} us  {extra}", flush=True)


# --- haar pair (VPU 2-tap)
fbh = get_filter_bank("haar")
n = 2048
x = make_inputs((n, n))[0]


def pair_h(v):
    a, h, vv, d = pk.dwt2d_fused(v, fbh)
    return pk.idwt2d_fused(a, h, vv, d, fbh, (n, n))


report("haar_pair_2048", timeit_chained(pair_h, x, iters=64))

# --- db2 MXU pair
fb = get_filter_bank("db2")


def pair_mx(v):
    c = mx.dwt2d_fused_mxu(v, fb)
    return mx.idwt2d_fused_mxu(*c, fb, (n, n))


if mx.dwt2d_fused_mxu(x, fb) is not None:
    report("db2_mxu_pair_2048(HIGHEST)", timeit_chained(pair_mx, x,
                                                        iters=64))
else:
    print("db2 mxu kernel not built (hlen<4 guard)")

# --- dot algorithm race: y = D @ xp repeated over bands, like level-0
b = 63
hlen = 4
Dnp, K = mx.analysis_matrix(fb.dec_lo, fb.dec_hi, b)

ALGOS = {}
try:
    from jax.lax import DotAlgorithmPreset as DAP
    ALGOS = {"X3": DAP.BF16_BF16_F32_X3, "X6": DAP.BF16_BF16_F32_X6,
             "F32": DAP.F32_F32_F32}
except ImportError:
    print("no DotAlgorithmPreset in this jax")


def make_dot_kernel(mode, ib, nc, L):
    def kern(d_ref, x_ref, lo_ref, hi_ref):
        D = d_ref[:, :]
        los, his = [], []
        nfull = L // b
        for k in range(nfull):
            xs = x_ref[2 * b * k: 2 * b * k + K, :]
            if mode == "HIGHEST":
                y = jax.lax.dot(D, xs, precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            elif mode == "DEFAULT":
                y = jax.lax.dot(D, xs, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
            else:
                y = jax.lax.dot_general(
                    D, xs, (((1,), (0,)), ((), ())),
                    precision=ALGOS[mode],
                    preferred_element_type=jnp.float32)
            los.append(y[:b, :])
            his.append(y[b:, :])
        r = L - nfull * b
        assert r == 0
        lo_ref[:, :] = jnp.concatenate(los, axis=0)
        hi_ref[:, :] = jnp.concatenate(his, axis=0)
    return kern


def build_dot(mode, nr, nc, ib):
    L = ib // 2
    if L % b:
        return None
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ib + hlen - 2, nc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    # note: sloppy banding at edges (measurement only, not correctness)
    out_spec = pl.BlockSpec((L, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc), jnp.float32)
    kern = make_dot_kernel(mode, ib, nc, L)
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[d_spec, in_spec],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=CP)
    return call


# accuracy probe in plain XLA first (no pallas), vs float64
rng = np.random.default_rng(0)
xp64 = rng.random((K, 512)) * 255.0
D64 = Dnp.astype(np.float64)
want = D64 @ xp64
xp32 = jnp.asarray(xp64, jnp.float32)
Dj = jnp.asarray(Dnp)
for mode in ["DEFAULT", "HIGHEST"] + list(ALGOS):
    try:
        if mode in ("DEFAULT", "HIGHEST"):
            got = jax.jit(lambda a, c: jax.lax.dot(
                a, c, precision=getattr(jax.lax.Precision, mode),
                preferred_element_type=jnp.float32))(Dj, xp32)
        else:
            got = jax.jit(lambda a, c: jax.lax.dot_general(
                a, c, (((1,), (0,)), ((), ())), precision=ALGOS[mode],
                preferred_element_type=jnp.float32))(Dj, xp32)
        err = float(np.abs(np.asarray(got, np.float64) - want).max())
        print(f"xla dot {mode:8s} abs err vs f64 (255-scale): {err:.2e}",
              flush=True)
    except Exception as e:
        print(f"xla dot {mode}: FAILED {type(e).__name__}: {e}",
              flush=True)

# pallas timing race: level-0-like total work at 2048^2
nr = nc = 2048
ib = 504  # 4 * b * 2 = 504 rows -> L = 252 = 4*63, nr % ib != 0 though
# choose ib = 2*b*k dividing 2048: b=63 -> no. use b=64-ish? Instead use
# nr=2016 grid... simplest: b=64 variant matrix (K=130 > 128, spills a
# second MXU tile -- acceptable for a relative race)
b2 = 64
D2, K2 = mx.analysis_matrix(fb.dec_lo, fb.dec_hi, b2)


def make_dot_kernel2(mode, ib, L):
    def kern(d_ref, x_ref, lo_ref, hi_ref):
        D = d_ref[:, :]
        los, his = [], []
        for k in range(L // b2):
            xs = x_ref[2 * b2 * k: 2 * b2 * k + K2, :]
            if mode == "HIGHEST":
                y = jax.lax.dot(D, xs, precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            elif mode == "DEFAULT":
                y = jax.lax.dot(D, xs, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
            else:
                y = jax.lax.dot_general(
                    D, xs, (((1,), (0,)), ((), ())),
                    precision=ALGOS[mode],
                    preferred_element_type=jnp.float32)
            los.append(y[:b2, :])
            his.append(y[b2:, :])
        lo_ref[:, :] = jnp.concatenate(los, axis=0)
        hi_ref[:, :] = jnp.concatenate(his, axis=0)
    return kern


def build_dot2(mode, nr, nc, ib=512):
    L = ib // 2
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ib + K2 - 2 * b2, nc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc), jnp.float32)
    call = pl.pallas_call(
        make_dot_kernel2(mode, ib, L), grid=(nr // ib,),
        in_specs=[d_spec, in_spec], out_specs=[out_spec] * 2,
        out_shape=[out_sds] * 2, compiler_params=CP)
    return call


xbig = make_inputs((nr, nc))[0]
D2j = np.asarray(D2)
for mode in ["DEFAULT", "HIGHEST"] + list(ALGOS):
    try:
        call = build_dot2(mode, nr, nc)
        f = lambda v: call(D2j, v)[0].repeat(2, axis=0)  # back to (nr, nc)
        t = timeit_chained(f, xbig, iters=64)
        report(f"pallas banded-dot rowpass {mode}", t)
    except Exception as e:
        print(f"pallas dot {mode}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
