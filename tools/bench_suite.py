#!/usr/bin/env python
"""Benchmark suite — the reference's benchmark machinery, TPU-native.

The reference ships test/benchmark.py (shape sweep 128^2..2048^2, pywt vs
PDWT wall-clock) and benchmark_results_parser.py (speedup tables).  This
suite measures the same configurations with the hardened chained-timing
protocol (tools/ubench.py) and emits one JSON object per line plus a
markdown summary table, so rounds can be diffed.

Usage:  python tools/bench_suite.py [--quick] [--out results.jsonl]

Configs (BASELINE.md "benchmark configs"):
  * 2D DWT fwd / inv / roundtrip, db2, 3 levels, 128^2 .. 2048^2
  * wavelet family sweep haar/db4/sym8/coif3/bior4.4 at 2048^2, 3 levels
  * SWT db2, 4 levels, 1024^2
  * denoise pipeline (forward -> soft threshold -> inverse) 2048^2
  * batched-1D: 2048 rows x 4096 samples, db2
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer shapes, fewer iterations")
    ap.add_argument("--out", default=None, help="append JSONL here")
    args = ap.parse_args()

    import jax
    import ubench
    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.core import dwt, swt, thresh

    dev = jax.devices()[0].device_kind
    iters = 64 if args.quick else 128
    results = []

    def record(name, seconds, unit="us"):
        row = {"bench": name, "time_us": round(seconds * 1e6, 2),
               "throughput_fps": round(1.0 / seconds, 1),
               "device": dev}
        results.append(row)
        print(json.dumps(row), flush=True)

    sizes = [512, 2048] if args.quick else [128, 256, 512, 1024, 2048]
    fb = get_filter_bank("db2")
    for n in sizes:
        x0 = ubench.make_inputs((n, n))[0]
        rt = lambda v: dwt.waverec2(dwt.wavedec2(v, fb, 3), fb, (n, n))
        record(f"dwt2d_roundtrip_db2_L3_{n}",
               ubench.timeit_chained(rt, x0, iters=iters))

    n = 2048
    x0 = ubench.make_inputs((n, n))[0]
    for wname in (["db4"] if args.quick
                  else ["haar", "db4", "sym8", "coif3", "bior4.4"]):
        fbw = get_filter_bank(wname)
        rt = lambda v: dwt.waverec2(dwt.wavedec2(v, fbw, 3), fbw, (n, n))
        record(f"dwt2d_roundtrip_{wname}_L3_2048",
               ubench.timeit_chained(rt, x0, iters=iters))

    # SWT 1024^2, 4 levels
    m = 1024
    fb2 = get_filter_bank("db2")
    s0 = ubench.make_inputs((m, m))[0]
    rt_swt = lambda v: swt.iswt2d(swt.swt2d(v, fb2, 4), fb2)
    record("swt2d_roundtrip_db2_L4_1024",
           ubench.timeit_chained(rt_swt, s0, iters=max(16, iters // 4)))

    # denoise pipeline 2048^2
    def denoise(v):
        c = dwt.wavedec2(v, fb, 3)
        c = thresh.soft_threshold(c, 1.0)
        return dwt.waverec2(c, fb, (n, n))
    record("denoise_soft_db2_L3_2048",
           ubench.timeit_chained(denoise, x0, iters=iters))

    # batched 1D
    b0 = ubench.make_inputs((2048, 4096))[0]
    rt1 = lambda v: dwt.waverec1(dwt.wavedec1(v, fb, 3), fb, 4096)
    record("dwt1d_batched2048_roundtrip_db2_L3_4096",
           ubench.timeit_chained(rt1, b0, iters=max(16, iters // 4)))

    # long single 1D signal (reference sweeps 1D up to 1e7)
    if not args.quick:
        nl = 1 << 22
        l0 = ubench.make_inputs((nl,))[0]
        rtl = lambda v: dwt.waverec1(dwt.wavedec1(v, fb, 5), fb, nl)
        record("dwt1d_long_roundtrip_db2_L5_4Mi",
               ubench.timeit_chained(rtl, l0, iters=16))

    if args.out:
        with open(args.out, "a") as f:
            stamp = time.strftime("%Y-%m-%d %H:%M:%S")
            for row in results:
                row["when"] = stamp
                f.write(json.dumps(row) + "\n")

    print("\n| bench | us | frames/s |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in results:
        print(f"| {r['bench']} | {r['time_us']} | {r['throughput_fps']} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
