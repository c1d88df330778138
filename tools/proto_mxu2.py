"""Prototype race: level-0 separable analysis variants on the real TPU.

Variants (all band-grid fused kernels, same halo machinery as
ops/pallas_dwt):
  vpu      — current tap-loop kernel (baseline, ops/pallas_dwt)
  mxu_hi   — row+col passes as banded MXU dots, precision=HIGHEST
  mxu_x4   — same dots at DEFAULT precision with a manual bf16 4-term
             split (D=Dh+Dl, x=xh+xl) for ~fp32 accuracy
  mxu_x1   — DEFAULT single-pass (speed reference only; fails precision)

Also measures per-pallas-call overhead and pallas-copy HBM bandwidth.
"""

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
from pypwt_tpu.utils.profiling import (timeit_chained, make_inputs,
                                       enable_compile_cache)

VMEM = pltpu.VMEM
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
DEFAULT = jax.lax.Precision.DEFAULT
HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Banded-matrix extraction from the conv oracle (identity trick)
# ---------------------------------------------------------------------------

def analysis_block_matrix(dec_lo, dec_hi, b):
    """D (2b, K): rows [lo_b; hi_b] of the decimating-analysis map from
    K = 2b + hlen - 2 consecutive padded samples (same index algebra as
    conv.analysis_core: out[i] = sum_j f[hlen-1-j] xp[2i+j])."""
    flo = np.asarray(dec_lo, np.float64)
    fhi = np.asarray(dec_hi, np.float64)
    hlen = len(flo)
    K = 2 * b + hlen - 2
    D = np.zeros((2 * b, K), np.float64)
    for i in range(b):
        for j in range(hlen):
            D[i, 2 * i + j] += flo[hlen - 1 - j]
            D[b + i, 2 * i + j] += fhi[hlen - 1 - j]
    return np.ascontiguousarray(D, np.float32), K


def _split_np(D):
    import ml_dtypes
    Dh = D.astype(ml_dtypes.bfloat16)
    Dl = (D - Dh.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return Dh, Dl


def _dot(trip, x, mode):
    D, Dh, Dl = trip
    if mode == "hi":
        return jax.lax.dot(D, x, precision=HIGHEST,
                           preferred_element_type=jnp.float32)
    if mode == "x1":
        return jax.lax.dot(D, x, precision=DEFAULT,
                           preferred_element_type=jnp.float32)
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (jax.lax.dot(Dh, xh, precision=DEFAULT, preferred_element_type=f32)
            + jax.lax.dot(Dh, xl, precision=DEFAULT,
                          preferred_element_type=f32)
            + jax.lax.dot(Dl, xh, precision=DEFAULT,
                          preferred_element_type=f32)
            + jax.lax.dot(Dl, xl, precision=DEFAULT,
                          preferred_element_type=f32))


def _band_dots(xp, main, rem, b, K, L, mode):
    """Banded analysis on padded xp (P, W) -> lo, hi (L, W)."""
    los, his = [], []
    nfull = L // b
    for k in range(nfull):
        y = _dot(main, xp[2 * b * k: 2 * b * k + K, :], mode)
        los.append(y[:b, :])
        his.append(y[b:, :])
    r = L - nfull * b
    if r:
        Kr = rem[0].shape[1]
        y = _dot(rem, xp[2 * b * nfull: 2 * b * nfull + Kr, :], mode)
        los.append(y[:r, :])
        his.append(y[r:, :])
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    return lo, hi


def build_mxu_analysis(nr, nc, fb, mode, ib=256, b=None):
    hlen = fb.hlen
    if b is None:
        b = (128 - hlen + 2) // 2  # K fits one MXU K-tile
    lp, rp = conv.analysis_pads(hlen)
    hh = 8 if max(lp, rp, 1) <= 8 else 16
    assert nr % ib == 0 and ib % hh == 0

    L_row, L_col = ib // 2, nc // 2
    D_np, K = analysis_block_matrix(fb.dec_lo, fb.dec_hi, b)
    mats = [D_np, *_split_np(D_np)]
    rem_row = L_row - (L_row // b) * b
    rem_col = L_col - (L_col // b) * b
    for r in (rem_row, rem_col):
        if r:
            Dr, _ = analysis_block_matrix(fb.dec_lo, fb.dec_hi, r)
            mats += [Dr, *_split_np(Dr)]
    n_mats = len(mats)
    i_rem_row = 1 if rem_row else None
    i_rem_col = (1 + bool(rem_row)) if rem_col else None

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    d_spec = pl.BlockSpec(memory_space=VMEM)
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)

    def kern(*refs):
        mrefs = refs[:n_mats]
        top_ref, body_ref, bot_ref = refs[n_mats:n_mats + 3]
        a_ref, h_ref, v_ref, d2_ref = refs[n_mats + 3:]
        trips = [tuple(mrefs[3 * i + j][:, :] for j in range(3))
                 for i in range(n_mats // 3)]
        main = trips[0]
        rr = trips[i_rem_row] if i_rem_row is not None else None
        rc_ = trips[i_rem_col] if i_rem_col is not None else None

        rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
        lo, hi = _band_dots(rows, main, rr, b, K, L_row, mode)

        def cols(t):
            tt = t.T  # (nc, ib//2)
            n = tt.shape[0]
            parts = []
            if lp:
                parts.append(tt[n - lp:, :])
            parts.append(tt)
            if rp:
                parts.append(tt[:rp, :])
            tp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt
            l2, h2 = _band_dots(tp, main, rc_, b, K, L_col, mode)
            return l2.T, h2.T

        a, v = cols(lo)
        h, dd = cols(hi)
        a_ref[:, :] = a
        h_ref[:, :] = h
        v_ref[:, :] = v
        d2_ref[:, :] = dd

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=CP)

    mats_j = [jnp.asarray(m) for m in mats]

    def fused(x):
        return call(*mats_j, x, x, x)

    return fused


# ---------------------------------------------------------------------------

def overhead_and_bw():
    def copy_kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 1.0000001

    n = 2048
    spec = pl.BlockSpec((256, n), lambda i: (i, 0), memory_space=VMEM)
    call = pl.pallas_call(copy_kern, grid=(n // 256,),
                          in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((n, n),
                                                         jnp.float32),
                          compiler_params=CP)
    x0 = make_inputs((n, n))[0]
    t = timeit_chained(call, x0, iters=128)
    print(f"scale-copy 2048^2: {t*1e6:7.2f} us  "
          f"({2*n*n*4/t/1e9:7.1f} GB/s r+w)")

    spec = pl.BlockSpec(memory_space=VMEM)
    call = pl.pallas_call(copy_kern, in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((8, 128),
                                                         jnp.float32))
    x0 = make_inputs((8, 128))[0]

    def step8(c):
        for _ in range(8):
            c = call(c)
        return c
    t = timeit_chained(step8, x0, iters=64)
    print(f"trivial pallas call: {t/8*1e6:7.2f} us/call")


def race(n, wname):
    fb = get_filter_bank(wname)
    x = make_inputs((n, n))[0] * 255.0

    dwt.set_kernels("jnp")
    ref = [np.asarray(o) for o in jax.jit(lambda y: dwt.dwt2d(y, fb))(x)]
    dwt.set_kernels("auto")

    cfgs = [("vpu", None), ("mxu_hi", "hi"), ("mxu_x4", "x4"),
            ("mxu_x1", "x1")]
    for tag, mode in cfgs:
        if tag == "vpu":
            f = jax.jit(lambda y: pk.dwt2d_fused(y, fb))
        else:
            f = jax.jit(build_mxu_analysis(n, n, fb, mode))
        out = f(x)
        err = max(float(jnp.abs(o - r).max()) for o, r in zip(out, ref))

        def step(c, f=f):
            o = f(c)
            up = jnp.concatenate([o[0], o[1]], axis=0)
            dn = jnp.concatenate([o[2], o[3]], axis=0)
            return jnp.concatenate([up, dn], axis=1) * 1.0000002
        t = timeit_chained(step, x, iters=64)
        print(f"{wname:5s} {tag:7s}: {t*1e6:8.2f} us   err vs jnp {err:.3e}")


if __name__ == "__main__":
    enable_compile_cache(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".jax_cache_tpu"))
    if "--bw" in sys.argv:
        overhead_and_bw()
    race(2048, "db2")
    race(2048, "sym8")
