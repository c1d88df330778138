"""Headline breakdown: where do the 208 us of the db2 L3 roundtrip go?

Measures, on the real TPU with chained timing:
  * pure pallas copy at each level size (per-call overhead + streaming bw)
  * each analysis / synthesis level in isolation (2048^2, 1024^2, 512^2)
  * analysis level-0 WITHOUT the column pass (isolates transpose+col cost)
  * full roundtrip for reference

One-off exploration tool feeding the roofline work (VERDICT item 1).
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

enable_compile_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir, ".jax_cache_tpu"))

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
      flush=True)


def copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def build_copy(nr, nc, ib):
    spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        copy_kernel, grid=(nr // ib,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nr, nc), jnp.float32),
        compiler_params=CP)


def report(name, secs, mb):
    bw = mb / 1024 / secs if secs > 0 else 0
    print(f"{name:42s} {secs*1e6:8.1f} us  {bw:7.1f} GB/s", flush=True)


fb = get_filter_bank("db2")

# --- copy bandwidth / call overhead
for n in (2048, 1024, 512):
    x = make_inputs((n, n))[0]
    f = build_copy(n, n, min(512, n))
    t = timeit_chained(lambda v: f(v), x, iters=64)
    report(f"pallas_copy_{n}", t, 2 * n * n * 4 / 1e6)

# --- single analysis levels
for n in (2048, 1024, 512):
    x = make_inputs((n, n))[0]
    t = timeit_chained(lambda v: pk.dwt2d_fused(v, fb)[0], x, iters=64)
    report(f"ana_level_{n}", t, 2 * n * n * 4 / 1e6)

# --- single synthesis levels
for n in (2048, 1024, 512):
    h = n // 2
    a = make_inputs((h, h), n=4)
    t = timeit_chained(
        lambda v: pk.idwt2d_fused(v, a[1], a[2], a[3], fb, (n, n)),
        a[0], iters=64)
    report(f"syn_level_{n}", t, 2 * n * n * 4 / 1e6)

# --- analysis row-pass only (no transpose / col pass): hacked kernel
def rowpass_kernel(flo, fhi, lp, rp, ib, top_ref, body_ref, bot_ref,
                   lo_ref, hi_ref):
    rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
    lo, hi = pk._analysis_sub(rows, flo, fhi, ib // 2)
    lo_ref[:, :] = lo
    hi_ref[:, :] = hi


def build_rowpass(nr, nc, fb, ib=512, hh=8):
    flo, fhi = pk._taps(fb.dec_lo), pk._taps(fb.dec_hi)
    lp, rp = conv.analysis_pads(fb.hlen)
    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    out_spec = pl.BlockSpec((ib // 2, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc), jnp.float32)
    import functools
    kern = functools.partial(rowpass_kernel, flo, fhi, lp, rp, ib)
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=CP)
    return lambda x: call(x, x, x)


n = 2048
x = make_inputs((n, n))[0]
f = build_rowpass(n, n, fb)
t = timeit_chained(lambda v: f(v)[0], x, iters=64)
report("ana_rowpass_only_2048", t, 2 * n * n * 4 / 1e6)


# --- transpose-only kernel at the post-rowpass shape
def tr_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def build_tr(nr, nc, ib):
    spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((nc, ib), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        tr_kernel, grid=(nr // ib,), in_specs=[spec], out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((nc, nr), jnp.float32),
        compiler_params=CP)


ftr = build_tr(1024, 2048, 256)
xt = make_inputs((1024, 2048))[0]
t = timeit_chained(lambda v: ftr(v), xt, iters=64)
report("transpose_1024x2048", t, 2 * 1024 * 2048 * 4 / 1e6)

# --- full roundtrip reference
rt = lambda v: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb, (n, n))
t = timeit_chained(rt, x, iters=64)
report("roundtrip_db2_L3_2048", t, 0.001)
