"""Per-level VPU-vs-MXU timing for stationary levels (TPU lab script).

For each (wavelet, level) at 1024^2 it times one fused analysis level on
the VPU tap-loop kernel and on the banded MXU kernel, plus the synthesis
pair, to ground the dispatch rule in core/swt.py (hlen threshold, and
whether deep dilations should fall back to the VPU).

Run on the real TPU: python tools/proto_mxu_swt.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    import jax
    from pypwt_tpu.utils import profiling
    from pypwt_tpu.utils.profiling import timeit_chained, make_inputs
    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.ops import pallas_dwt as pk
    from pypwt_tpu.ops import mxu_swt as mxs

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    n = int(os.environ.get("PYPWT_PROTO_N", "1024"))
    x0 = make_inputs((n, n))[0] * 255.0
    rows = []
    for wname in ("db2", "db4", "sym8", "db10"):
        fb = get_filter_bank(wname)
        for level in (1, 2, 3, 4):
            row = {"wavelet": wname, "hlen": fb.hlen, "level": level}
            fns = {
                "vpu": lambda v, fb=fb, lv=level:
                    pk.swt2d_level_fused(v, fb, lv),
                "mxu": lambda v, fb=fb, lv=level:
                    mxs.swt2d_level_fused_mxu(v, fb, lv),
            }
            for name, fn in fns.items():
                if fn(x0) is None:
                    row[name + "_us"] = None
                    continue
                # SWT is undecimated: returning only the A plane keeps
                # the step shape-preserving for the chained-scan timer
                # (the opaque pallas call still computes all 4 outputs)
                step = lambda v, fn=fn: fn(v)[0]
                try:
                    row[name + "_us"] = round(
                        timeit_chained(step, x0, iters=32) * 1e6, 1)
                except Exception as e:
                    row[name + "_us"] = f"ERR:{type(e).__name__}"
            # synthesis pair at this level
            c = fns["vpu"](x0)
            if c is not None:
                ifns = {
                    "ivpu": lambda a, fb=fb, lv=level, c=c:
                        pk.iswt2d_level_fused(a, c[1], c[2], c[3], fb, lv),
                    "imxu": lambda a, fb=fb, lv=level, c=c:
                        mxs.iswt2d_level_fused_mxu(a, c[1], c[2], c[3],
                                                   fb, lv),
                }
                for name, fn in ifns.items():
                    if fn(c[0]) is None:
                        row[name + "_us"] = None
                        continue
                    try:
                        row[name + "_us"] = round(
                            timeit_chained(fn, c[0], iters=32) * 1e6, 1)
                    except Exception as e:
                        row[name + "_us"] = f"ERR:{type(e).__name__}"
            # reduced-precision mode: single-pass bf16 dots (fresh
            # closure — jit caches on function identity)
            from pypwt_tpu.core import dwt as _dwt
            _dwt.set_mxu_precision("bf16")
            try:
                fb16 = lambda v, fb=fb, lv=level: \
                    mxs.swt2d_level_fused_mxu(v, fb, lv)
                if fb16(x0) is not None:
                    step_b = lambda v, fn=fb16: fn(v)[0]
                    try:
                        row["mxu_bf16_us"] = round(
                            timeit_chained(step_b, x0, iters=32) * 1e6, 1)
                    except Exception as e:
                        row["mxu_bf16_us"] = f"ERR:{type(e).__name__}"
            finally:
                _dwt.set_mxu_precision("highest")
            rows.append(row)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
