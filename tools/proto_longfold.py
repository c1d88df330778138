"""Race: long-1D analysis with XLA-side fold-pad copy (current) vs
in-kernel halo construction (row halos via _halo_specs, lane pads built
from sublane-shifted planes inside VMEM)."""

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

from pypwt_tpu.core import conv
from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.ops import pallas_dwt as pk
from pypwt_tpu.utils.profiling import (timeit_chained, make_inputs,
                                       enable_compile_cache)

enable_compile_cache(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir, ".jax_cache_tpu"))

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
print("backend:", jax.default_backend(), flush=True)

fb = get_filter_bank("db2")
flo, fhi = pk._taps(fb.dec_lo), pk._taps(fb.dec_hi)
lp, rp = conv.analysis_pads(fb.hlen)


def kern2(ib, c, top_ref, body_ref, bot_ref, lo_ref, hi_ref):
    body = body_ref[:, :]
    hh = top_ref.shape[0]
    # prev-row plane (row i holds row i-1; first row from the top halo)
    prev = jnp.concatenate([top_ref[hh - 1: hh, :], body[:-1, :]], axis=0)
    nxt = jnp.concatenate([body[1:, :], bot_ref[0:1, :]], axis=0)
    padded = jnp.concatenate(
        [prev[:, c - lp:], body, nxt[:, :rp]], axis=1)
    tp = padded.T
    lo, hi = pk._analysis_sub(tp, flo, fhi, c // 2)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


def build2(nr, c, ib=128, hh=8):
    top, body, bot = pk._halo_specs(ib, hh, nr, c)
    out_spec = pl.BlockSpec((ib, c // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c // 2), jnp.float32)
    call = pl.pallas_call(
        functools.partial(kern2, ib, c), grid=(nr // ib,),
        in_specs=[top, body, bot], out_specs=[out_spec] * 2,
        out_shape=[out_sds] * 2, compiler_params=CP)
    return lambda x2: call(x2, x2, x2)


n = 1 << 22
rc = conv.long1d_shape(n)
r, c = rc
x = make_inputs((n,))[0] * 255.0

# correctness vs jnp folded
want = conv.analysis_long1d(x, fb.dec_lo, fb.dec_hi, rc)
f2 = build2(r, c)
got = f2(x.reshape(r, c))
err = max(float(jnp.abs(g.reshape(-1) - w).max()) for g, w in
          zip(got, want))
print(f"in-kernel halo analysis err vs jnp: {err:.2e}", flush=True)

# race: one analysis level, chained (shape-preserving via concat trick:
# output lo,hi each (r, c/2) -> stack to (r, c))
def step_new(v2):
    lo, hi = f2(v2)
    return jnp.concatenate([lo, hi], axis=1)


def step_old(v2):
    lo, hi = pk.dwt1d_long_fused(v2.reshape(-1), fb, rc)
    return jnp.concatenate([lo.reshape(r, c // 2),
                            hi.reshape(r, c // 2)], axis=1)


x2 = x.reshape(r, c)
for name, f in (("new in-kernel halos", step_new),
                ("old fold-copy", step_old)):
    t = timeit_chained(f, x2, iters=64)
    print(f"{name}: {t*1e6:.1f} us", flush=True)
