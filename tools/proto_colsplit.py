"""Column-split band probe at 4096^2 (TPU lab script, round 4).

proto_4096.py established that the full-width ib=1024 analysis band is
VMEM-capacity-infeasible at 4096 cols ("Used 142.89M of 128.00M"), so the
analysis is stuck at ib=512 / 58% of floor.  _build_dwt2d_colsplit splits
the grid over column blocks so the 2048-grade (ib=1024 x cb=2048) band
fits again, at the price of two 128-lane halo-column reads per program
(+12.5% input traffic at cb=2048).  This times the level-0 pair
(analysis+synthesis of one level, the doc's standard unit) for:

  * full-width dispatch geometry (ib=512) — the incumbent,
  * colsplit ib=1024 cb=2048 — the capacity play,
  * colsplit ib=512  cb=2048 — isolates the halo-traffic cost,
  * at 2048^2: colsplit cb=1024 vs full-width ib=1024 — the control
    (full width should win where it fits; the dispatch rule must only
    fire where it doesn't).

Run on the real TPU:  python tools/proto_colsplit.py
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
    from pypwt_tpu.ops import pallas_dwt as pk

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    fb = get_filter_bank(os.environ.get("PYPWT_PROTO_W", "db2"))
    tlo, thi = pk._taps(fb.dec_lo), pk._taps(fb.dec_hi)

    def pair_full(n):
        def step(x):
            a, h, v, d = pk.dwt2d_fused(x, fb)
            return pk.idwt2d_fused(a, h, v, d, fb, (n, n))
        return step

    def pair_cs(n, ib, cb):
        f = pk._build_dwt2d_colsplit(n, n, tlo, thi, ib, cb,
                                     pk._interpret())
        if f is None:
            return None
        def step(x):
            a, h, v, d = f(x)
            return pk.idwt2d_fused(a, h, v, d, fb, (n, n))
        return step

    cases = [
        ("4096_full_dispatch", 4096, pair_full(4096)),
        ("4096_cs_ib1024_cb2048", 4096, pair_cs(4096, 1024, 2048)),
        ("4096_cs_ib512_cb2048", 4096, pair_cs(4096, 512, 2048)),
        ("2048_full_dispatch", 2048, pair_full(2048)),
        ("2048_cs_ib1024_cb1024", 2048, pair_cs(2048, 1024, 1024)),
    ]
    for name, n, step in cases:
        if step is None:
            print(json.dumps({"case": name, "us": "SKIP"}), flush=True)
            continue
        x0 = make_inputs((n, n))[0] * 255.0
        try:
            t = timeit_chained(step, x0, iters=32) * 1e6
        except Exception as e:
            t = f"ERR:{type(e).__name__}: {e}"
        print(json.dumps({"case": name, "us": t}), flush=True)


if __name__ == "__main__":
    main()
