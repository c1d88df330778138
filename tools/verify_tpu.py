"""On-device correctness matrix: every wavelet x every transform mode.

The reference proves correctness ON THE DEVICE with a full sweep
(test/test_all.py over test/test_wavelets.py:655-688: all wavelets x
{DWT2, DWT1(batched), SWT2, SWT1} x levels).  The CPU pytest suite here
runs the Pallas kernels in interpret mode only, so this tool is the
native-Mosaic equivalent: on the real TPU it runs all 72 filter banks
through {dwt2d, swt2d, batched-1d dwt, long-1d} roundtrips — which
exercises every kernel family (VPU tap loops, banded MXU dots, fused
SWT, folded long-1D) at dispatch-selected routing — records the
max-abs roundtrip error against the reference envelope
(3e-4 * 2**levels * data_scale, test_wavelets.py:100-103), and also
cross-checks the kernel outputs against the jnp oracle path for a
sample of banks.

Emits one JSON line per (wavelet, mode); exits non-zero on any gate
failure.  Committed per round as VERIFY_TPU_r{N}.jsonl.

Usage: python tools/verify_tpu.py [--quick] [--out VERIFY_TPU.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

SCALE = 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="8 representative banks instead of all 72")
    ap.add_argument("--out", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pypwt_tpu.utils import profiling
    from pypwt_tpu.filters import get_filter_bank, wavelist
    from pypwt_tpu.core import dwt, swt, shapes

    if jax.default_backend() == "tpu":
        profiling.enable_compile_cache(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), os.pardir,
            ".jax_cache_tpu"))

    dev = jax.devices()[0].device_kind
    backend = jax.default_backend()
    names = (["haar", "db2", "db8", "sym8", "coif3", "bior4.4", "rbio3.5",
              "db10"] if args.quick else wavelist())

    n = args.size
    rng = np.random.default_rng(42)
    x2 = jnp.asarray(rng.random((n, n), dtype=np.float32) * SCALE)
    xb = jnp.asarray(rng.random((256, 1024), dtype=np.float32) * SCALE)
    xl = jnp.asarray(rng.random(1 << 18, dtype=np.float32) * SCALE)

    rows, failed = [], []

    def record(wname, mode, err, gate, extra=None):
        ok = bool(err <= gate)
        row = {"wavelet": wname, "mode": mode,
               "max_err": float(f"{err:.3e}"),
               "gate": float(f"{gate:.3e}"), "ok": ok,
               "backend": backend, "device": dev}
        if extra:
            row.update(extra)
        rows.append(row)
        if not ok:
            failed.append((wname, mode, err))
        print(json.dumps(row), flush=True)

    # NOTE: every error is computed INSIDE one jit returning a scalar —
    # eager ops through this rig's compile relay cost ~minutes each
    # (measured 533 s for an eager abs/sub/max chain at 512^2)
    def rt_err(rt, x0):
        return float(jax.jit(
            lambda v: jnp.abs(rt(v) - v).max())(x0))

    t_start = time.time()
    for wname in names:
        fb = get_filter_bank(wname)
        lv = min(args.levels,
                 shapes.clamp_levels(args.levels, (n, n), fb.hlen, 2))
        gate = 3e-4 * (1 << lv) * SCALE

        record(wname, f"dwt2d_L{lv}",
               rt_err(lambda v, fb=fb, lv=lv: dwt.waverec2(
                   dwt.wavedec2(v, fb, lv), fb, (n, n)), x2), gate)

        slv = min(2, lv)
        sgate = 3e-4 * (1 << slv) * SCALE
        record(wname, f"swt2d_L{slv}",
               rt_err(lambda v, fb=fb, slv=slv: swt.iswt2d(
                   swt.swt2d(v, fb, slv), fb), x2), sgate)

        record(wname, "dwt1d_batched_L2",
               rt_err(lambda v, fb=fb: dwt.waverec1(
                   dwt.wavedec1(v, fb, 2), fb, 1024), xb),
               3e-4 * 4 * SCALE)

        record(wname, "dwt1d_long_L3",
               rt_err(lambda v, fb=fb: dwt.waverec1(
                   dwt.wavedec1(v, fb, 3), fb, 1 << 18), xl),
               3e-4 * 8 * SCALE)

    # differential: dispatch-selected kernels vs the pure-jnp oracle path
    for wname in ("db2", "sym8", "bior4.4"):
        fb = get_filter_bank(wname)
        got = jax.jit(lambda v, fb=fb: dwt.wavedec2(v, fb, 3))(x2)
        dwt.set_kernels("jnp")
        try:
            want = jax.jit(lambda v, fb=fb: dwt.wavedec2(v, fb, 3))(x2)
        finally:
            dwt.set_kernels("auto")
        diff = float(jax.jit(lambda a, b: jnp.asarray(
            [jnp.abs(x - y).max() for x, y in
             zip(jax.tree.leaves(a), jax.tree.leaves(b))]).max())(
                 got, want))
        record(wname, "kernel_vs_jnp_dwt2d_L3", diff, 3e-3 * SCALE)

    elapsed = time.time() - t_start
    print(f"\n{len(rows)} checks in {elapsed:.0f}s on {dev} ({backend}); "
          f"{len(failed)} failed", file=sys.stderr)

    if args.out:
        with open(args.out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")

    if failed:
        for wname, mode, err in failed:
            print(f"FAIL {wname} {mode}: {err:.3e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
