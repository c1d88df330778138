"""North-star benchmark: 2D DWT+IDWT frames/s/chip (2048^2, db2, 3 levels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (the real TPU chip under the
driver).  Extra diagnostic lines go to stderr.

Measurement protocol (tools/ubench.py): the round trip runs as a long
lax.scan whose carry is the image itself, synchronized by a host readback
whose latency is calibrated out.  This defeats three platform hazards
observed on the axon-tunneled TPU: block_until_ready returning before
execution finishes, a results cache keyed on input bytes (persisting
across processes), and loop-invariant hoisting of constant-input bodies.
Chained timing serializes iterations, so it is a conservative lower bound
on pipelined throughput.

The reference publishes no numbers (BASELINE.md), so the baseline is our
own first honest measurement on this hardware (BASELINE_FPS below);
vs_baseline tracks progress across rounds.
"""

import json
import os
import sys
import time

import numpy as np

# First honest round-1 measurement on the driver's TPU (jnp/XLA path,
# chained protocol).  Update only when re-baselining is explicitly
# intended.
BASELINE_FPS = 2750.0

# Performance floor (VERDICT r4 next #4): the headline has measured
# 5084/5052/5061 fps over rounds 2-4; a regression below ~10% of that
# band now exits non-zero (the JSON line is still printed first so the
# driver records the regressed number alongside the failure).
HEADLINE_FLOOR_FPS = 4550.0


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import jax
    import jax.numpy as jnp
    import ubench

    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.core import dwt

    size = 2048
    levels = 3
    fb = get_filter_bank("db2")

    x0 = ubench.make_inputs((size, size))[0]

    def roundtrip(img):
        return dwt.waverec2(dwt.wavedec2(img, fb, levels), fb, (size, size))

    # correctness gate: lossless round trip within float32 envelope
    y = jax.jit(roundtrip)(x0)
    err = float(jnp.abs(y - x0).max())
    print(f"[bench] device={jax.devices()[0].device_kind} "
          f"roundtrip_err={err:.2e}", file=sys.stderr)
    assert err < 7e-4, "correctness gate failed"

    t = ubench.timeit_chained(roundtrip, x0, iters=256, reps=5)
    fps = 1.0 / t

    # pipelined bound: 4 independent chains interleaved in one scan.
    # The headline stays the chained (dependency-serialized) number for
    # round-over-round comparability; pipelined is what a streaming
    # (tomography) user gets if dispatch overlaps HBM with compute.
    tp = ubench.timeit_pipelined(roundtrip, x0, k=4, iters=64, reps=3)

    vs = fps / BASELINE_FPS if BASELINE_FPS else 1.0
    print(f"[bench] chained {t * 1e6:.1f} us/frame, "
          f"pipelined {tp * 1e6:.1f} us/frame "
          f"(x{t / tp:.2f} overlap)", file=sys.stderr)
    print(json.dumps({
        "metric": "2D DWT+IDWT frames/s/chip (2048^2, db2, 3 levels)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
        "pipelined_fps": round(1.0 / tp, 3),
    }))
    if fps < HEADLINE_FLOOR_FPS:
        print(f"[bench] PERFORMANCE FLOOR FAILED: {fps:.0f} fps < "
              f"{HEADLINE_FLOOR_FPS:.0f} floor", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
