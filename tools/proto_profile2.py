"""Headline breakdown #2: per-level-pair costs (shape-preserving steps).

pair_N  = one analysis level + one synthesis level at N^2 (chained)
rowonly = row-pass analysis + row-pass synthesis (no transpose/col work),
          isolating the transpose + column-pass cost per level pair.
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
from pypwt_tpu.utils.profiling import (timeit_chained, make_inputs,
                                       enable_compile_cache)

enable_compile_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir, ".jax_cache_tpu"))

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
      flush=True)


def report(name, secs, floor_us):
    print(f"{name:40s} {secs*1e6:8.1f} us   (copy floor ~{floor_us:.0f})",
          flush=True)


fb = get_filter_bank("db2")

# --- per-level pairs
for n in (2048, 1024, 512):
    x = make_inputs((n, n))[0]

    def pair(v, n=n):
        a, h, vv, d = pk.dwt2d_fused(v, fb)
        return pk.idwt2d_fused(a, h, vv, d, fb, (n, n))

    t = timeit_chained(pair, x, iters=64)
    report(f"pair_{n}", t, 4 * n * n * 4 / 670e3 * 1e3)

# --- row-pass-only pair at 2048 (no transposes, no col pass)
def rowpass_kernel(flo, fhi, lp, rp, ib, top_ref, body_ref, bot_ref,
                   o_ref):
    rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
    lo, hi = pk._analysis_sub(rows, flo, fhi, ib // 2)
    o_ref[: ib // 2, :] = lo
    o_ref[ib // 2:, :] = hi


def rowsyn_kernel(flo, fhi, lp, rp, ib, top_ref, body_ref, bot_ref,
                  o_ref):
    rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
    lo, hi = rows[: rows.shape[0] // 2, :], rows[rows.shape[0] // 2:, :]
    # not algebraically the inverse (banding differs) -- same op count
    o_ref[:, :] = pk._synthesis_sub(
        jnp.concatenate(
            [lo[-lp:, :], lo, lo[:rp, :]], axis=0) if lp or rp else lo,
        jnp.concatenate(
            [hi[-lp:, :], hi, hi[:rp, :]], axis=0) if lp or rp else hi,
        flo, fhi, ib, lp)


def build_row_pair(nr, nc, fb, ib=512, hh=8):
    flo, fhi = pk._taps(fb.dec_lo), pk._taps(fb.dec_hi)
    rlo, rhi = pk._taps(fb.rec_lo), pk._taps(fb.rec_hi)
    lp, rp = conv.analysis_pads(fb.hlen)
    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    ana = pl.pallas_call(
        functools.partial(rowpass_kernel, flo, fhi, lp, rp, ib),
        grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=out_spec, out_shape=out_sds, compiler_params=CP)
    lps, rps = conv.synthesis_pads(fb.hlen, nr // 2, nr)
    syn = pl.pallas_call(
        functools.partial(rowsyn_kernel, rlo, rhi, lps, rps, ib),
        grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=out_spec, out_shape=out_sds, compiler_params=CP)
    return lambda v: syn(*([ana(v, v, v)] * 3))


n = 2048
x = make_inputs((n, n))[0]
f = build_row_pair(n, n, fb)
t = timeit_chained(f, x, iters=64)
report("rowonly_pair_2048", t, 4 * n * n * 4 / 670e3 * 1e3)

# --- transpose pair at 2048 (square, shape-preserving)
def tr_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def build_tr_full(n):
    spec = pl.BlockSpec((n, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        tr_kernel, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        compiler_params=CP)


for nn in (1024,):
    ft = build_tr_full(nn)
    xt = make_inputs((nn, nn))[0]
    t = timeit_chained(ft, xt, iters=64)
    report(f"transpose_whole_{nn}", t, 2 * nn * nn * 4 / 670e3 * 1e3)


# banded transpose 2048 (as the kernels do, ib=512)
def build_tr_band(n, ib):
    spec = pl.BlockSpec((ib, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((n, ib), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        tr_kernel, grid=(n // ib,), in_specs=[spec], out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        compiler_params=CP)


ftb = build_tr_band(2048, 512)
xtb = make_inputs((2048, 2048))[0]
t = timeit_chained(ftb, xtb, iters=64)
report("transpose_band512_2048", t, 2 * 2048 * 2048 * 4 / 670e3 * 1e3)

# --- full roundtrip reference
rt = lambda v: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb, (2048, 2048))
t = timeit_chained(rt, x, iters=64)
report("roundtrip_db2_L3_2048", t, 129)
