"""Long-1D fold kernels: plain vs scratch-ref variant, A/B on the chip.

Round 4 measured the plain (value-temporary) fold cliffing ~8x at
hlen >= 12 — per-tap slices of the transposed plane are unaligned
sublane relayouts and Mosaic keeps ~hlen of them live.  The scratch
variant (round 5) materializes the transposed/parity-split planes into
VMEM scratch refs once, so live temporaries stop scaling with hlen.

This times 4Mi-sample roundtrips (DWT L5 / SWT L3) on the FORCED VPU
fold path (set_kernels("pallas")) for both variants across hlen, plus
the banded-MXU long path for reference — grounding the long-1D routing
crossovers (core/dwt.py::_mxu_long_wanted, core/swt.py::
_mxu_swt_long_wanted).

Run on the real TPU:  python tools/proto_longfold_r5.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    from pypwt_tpu.utils import profiling
    from pypwt_tpu.utils.profiling import timeit_chained, make_inputs
    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.core import dwt, swt

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    nl = 1 << 22
    x0 = make_inputs((nl,))[0] * 255.0

    def time_rt(rt, iters=16):
        try:
            return round(timeit_chained(rt, x0, iters=iters) * 1e6, 1)
        except Exception as e:
            return f"ERR:{type(e).__name__}"

    names = os.environ.get("PYPWT_PROTO_W",
                           "db2,db4,db5,db6,sym8,db10").split(",")
    for wname in names:
        fb = get_filter_bank(wname)
        row = {"wavelet": wname, "hlen": fb.hlen}
        for variant in ("plain", "scratch"):
            os.environ["PYPWT_LONGFOLD"] = variant
            dwt.set_kernels("pallas")  # force the VPU fold path
            try:
                rt = lambda v, fb=fb: dwt.waverec1(
                    dwt.wavedec1(v, fb, 5), fb, nl)
                row[f"dwt_{variant}_us"] = time_rt(rt)
                rts = lambda v, fb=fb: swt.iswt1d(swt.swt1d(v, fb, 3),
                                                  fb)
                row[f"swt_{variant}_us"] = time_rt(rts, iters=8)
            finally:
                dwt.set_kernels("auto")
        os.environ.pop("PYPWT_LONGFOLD", None)
        # MXU reference arm (forced)
        dwt.set_kernels("mxu")
        try:
            rtm = lambda v, fb=fb: dwt.waverec1(dwt.wavedec1(v, fb, 5),
                                                fb, nl)
            row["dwt_mxu_us"] = time_rt(rtm)
            rtsm = lambda v, fb=fb: swt.iswt1d(swt.swt1d(v, fb, 3), fb)
            row["swt_mxu_us"] = time_rt(rtsm, iters=8)
        finally:
            dwt.set_kernels("auto")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
