"""Round-3 TPU measurement prototype (one process, serialized on the
compile relay):

1. per-chip cost of the SHARDED fused kernels vs the wrapped single-chip
   kernels (VERDICT r2 item 1 "done" criterion: within ~10% of the
   unsharded 197 us).  The sharded builders are called directly with
   locally-wrapped edge halos — the exact per-chip program a pod runs,
   minus the ppermute (which rides ICI concurrently).
2. static cycle-spinning with in-kernel shifts vs the roll path
   (item 4: 4-spin 2048^2 target <= 900 us).
3. tail-level fusion (item 6: levels 2..L in one pyramid kernel;
   2048^2 target <= 180 us, 1024^2 <= 40 us).

Writes findings to stdout as JSON lines; redirect to a file (piping
through tail buffers and looks hung).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pypwt_tpu.utils import profiling
    from pypwt_tpu.utils.profiling import timeit_chained, make_inputs
    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.core import dwt
    from pypwt_tpu.ops import pallas_dwt as pk
    from pypwt_tpu import pipeline as pl_

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    fb = get_filter_bank("db2")
    n = 2048
    x0 = make_inputs((n, n))[0] * 255.0

    def rec(name, seconds, extra=None):
        row = {"proto": name, "time_us": round(seconds * 1e6, 1)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    def err_of(f, x, ref=None):
        if ref is None:
            return float(jax.jit(lambda v: jnp.abs(f(v) - v).max())(x))
        return float(jax.jit(
            lambda v: jnp.abs(f(v) - ref(v)).max())(x))

    taps_d = pk._taps(fb.dec_lo), pk._taps(fb.dec_hi)
    taps_r = pk._taps(fb.rec_lo), pk._taps(fb.rec_hi)

    # ---- 1. sharded kernels, per-chip cost (local wrap as halos) ----
    # baseline: wrapped single-chip roundtrip
    rt = lambda v: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb, (n, n))
    rec("baseline_rt_2048_db2_L3", timeit_chained(rt, x0, iters=64),
        {"max_err": err_of(rt, x0)})

    fa, hha = pk.build_dwt2d_sharded(n, n, *taps_d, False)
    fsyn, hhs = pk.build_idwt2d_sharded(n, n, *taps_r, False)

    def rt_sharded(v):
        a = v
        sizes = [(n, n)]
        pyr = []
        for lev in range(3):
            nr = a.shape[0]
            fl, hh = pk.build_dwt2d_sharded(nr, a.shape[1], *taps_d,
                                            False)
            top, bot = a[-hh:, :], a[:hh, :]
            a, h, vv, dd = fl(a, top, bot)
            pyr.append((h, vv, dd))
            sizes.append(a.shape)
        for lev in range(2, -1, -1):
            h, vv, dd = pyr[lev]
            nr2, nc2 = sizes[lev]
            fs, hh = pk.build_idwt2d_sharded(nr2, nc2, *taps_r, False)
            halos = []
            for p in (a, h, vv, dd):
                halos += [p[-hh:, :], p[:hh, :]]
            a = fs(a, h, vv, dd, tuple(halos))
        return a

    rec("sharded_kernels_rt_2048_db2_L3",
        timeit_chained(rt_sharded, x0, iters=64),
        {"max_err": err_of(rt_sharded, x0)})

    # ---- 2. static cycle spinning ----
    shifts = ((0, 0), (1, 1), (2, 2), (3, 3))

    def cyc_fused(v):
        return pl_.denoise2d_cycle_spinning(v, "db2", 3, 1.0,
                                            shifts=shifts)
    rec("cycspin4_static_fused_2048", timeit_chained(
        cyc_fused, x0, iters=32))

    # roll path for comparison (force jnp-free rolls by temporarily
    # disabling the fused spin): measure via kernels mode flip
    pl_.denoise2d_cycle_spinning.clear_cache()

    # ---- 3. tail-level fusion ----
    for m, iters in ((2048, 64), (1024, 128)):
        xm = make_inputs((m, m))[0] * 255.0
        rtm = lambda v, m=m: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb,
                                          (m, m))
        rec(f"per_level_rt_{m}", timeit_chained(rtm, xm, iters=iters),
            {"max_err": err_of(rtm, xm)})
        dwt.set_tail_fuse(True)
        try:
            rtt = lambda v, m=m: dwt.waverec2(dwt.wavedec2(v, fb, 3),
                                              fb, (m, m))
            rec(f"tailfused_rt_{m}", timeit_chained(rtt, xm, iters=iters),
                {"max_err": err_of(rtt, xm)})
        finally:
            dwt.set_tail_fuse(False)



if __name__ == "__main__":
    main()
