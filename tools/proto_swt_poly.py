"""Banded vs polyphase a-trous MXU forms, A/B on the chip (round 5).

The polyphase reshape keeps the banded contraction compact
(K = b + hlen - 1 at every level) but pays two vreg relayouts per pass
(sublane rows merged into lanes and back), so it only wins past the
banded form's dilation cliff.  This probe times BOTH forms of the 2D
analysis and synthesis level kernels at 1024^2 around the boundary
spans, grounding _POLY_MIN_SPAN_ANA/_SYN in ops/mxu_swt.py.

Forms are forced via PYPWT_SWT_POLY=never|always; the builders'
lru caches are cleared between forms (the env knob is not part of the
cache key — it is a probe-only override).

Run on the real TPU:  python tools/proto_swt_poly.py
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
    from pypwt_tpu.ops import mxu_swt as mxs

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    n = int(os.environ.get("PYPWT_PROTO_N", "1024"))
    x0 = make_inputs((n, n))[0] * 255.0

    # (wavelet, level): spans 24..304 bracketing both cliffs
    cases = [("db2", 4), ("db4", 4), ("sym8", 3), ("db10", 3),
             ("sym8", 4), ("db10", 4), ("sym8", 5)]

    clear = mxs.clear_builder_caches

    for wname, level in cases:
        fb = get_filter_bank(wname)
        span = (fb.hlen - 1) * (1 << (level - 1))
        row = {"wavelet": wname, "hlen": fb.hlen, "level": level,
               "span": span}
        for form in ("never", "always"):
            os.environ["PYPWT_SWT_POLY"] = form
            clear()
            tag = "banded" if form == "never" else "poly"
            fn = lambda v, fb=fb, lv=level: \
                mxs.swt2d_level_fused_mxu(v, fb, lv)
            if fn(x0) is None:
                row[f"ana_{tag}_us"] = None
            else:
                step = lambda v, fn=fn: fn(v)[0]
                try:
                    row[f"ana_{tag}_us"] = round(
                        timeit_chained(step, x0, iters=32) * 1e6, 1)
                except Exception as e:
                    row[f"ana_{tag}_us"] = f"ERR:{type(e).__name__}"
            c = fn(x0)
            if c is not None:
                ifn = lambda a, fb=fb, lv=level, c=c: \
                    mxs.iswt2d_level_fused_mxu(a, c[1], c[2], c[3],
                                               fb, lv)
                if ifn(c[0]) is None:
                    row[f"syn_{tag}_us"] = None
                else:
                    try:
                        row[f"syn_{tag}_us"] = round(
                            timeit_chained(ifn, c[0], iters=32) * 1e6,
                            1)
                    except Exception as e:
                        row[f"syn_{tag}_us"] = f"ERR:{type(e).__name__}"
        os.environ.pop("PYPWT_SWT_POLY", None)
        clear()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
