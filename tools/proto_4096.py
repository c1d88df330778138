"""Band-budget probe at 4096^2 (TPU lab script, round 4).

At 2048^2 the analysis runs ib=1024 bands (68% of streaming floor); at
4096^2 the constant 30 MB working-set budget forces ib=256 (58%).  This
times the db2 L3 roundtrip at 4096^2 under several budgets to see
whether wider bands recover the 2048-grade efficiency.

Run on the real TPU:  python tools/proto_4096.py
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
    from pypwt_tpu.core import dwt
    from pypwt_tpu.ops import pallas_dwt as pk

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    n = int(os.environ.get("PYPWT_PROTO_N", "4096"))
    fb = get_filter_bank("db2")
    x0 = make_inputs((n, n))[0] * 255.0

    for mb in (30, 45, 60, 80):
        pk._VMEM_BUDGET = mb * 1024 * 1024
        pk.BAND_CHOICES.clear()
        # fresh closure per budget: jit caches on function identity and
        # the builders' lru caches key on geometry, not the budget —
        # clear them so the new budget actually re-picks bands
        for attr in dir(pk):
            obj = getattr(pk, attr)
            if callable(obj) and hasattr(obj, "cache_clear"):
                obj.cache_clear()
        rt = lambda v, fb=fb: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb,
                                           (n, n))
        try:
            t = timeit_chained(rt, x0, iters=32) * 1e6
        except Exception as e:
            t = f"ERR:{type(e).__name__}"
        bands = {repr(k): v for k, v in pk.BAND_CHOICES.items()}
        print(json.dumps({"budget_mb": mb, "roundtrip_us": t,
                          "bands": bands}), flush=True)


if __name__ == "__main__":
    main()
