"""North-star benchmark: 2D DWT+IDWT frames/s/chip (2048^2, db2, 3 levels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax.devices() provides (the real TPU chip under the
driver).  Extra diagnostic lines go to stderr.

The reference publishes no numbers (BASELINE.md), so the baseline is our
own first measurement on this hardware (BASELINE_FPS below); vs_baseline
tracks progress across rounds.
"""

import json
import sys
import time

import numpy as np

# First self-measured round-1 value on one TPU v5e chip (jnp core path).
# Update only when re-baselining is explicitly intended.
BASELINE_FPS = 1289.1


def main():
    import jax
    import jax.numpy as jnp

    from pypwt_tpu.filters import get_filter_bank
    from pypwt_tpu.core import dwt

    size = 2048
    levels = 3
    fb = get_filter_bank("db2")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((size, size), dtype=np.float32))

    fwd = jax.jit(lambda x: dwt.wavedec2(x, fb, levels))
    inv = jax.jit(lambda c: dwt.waverec2(c, fb, (size, size)))

    # warmup / compile
    pyr = fwd(x)
    y = inv(pyr)
    jax.block_until_ready(y)
    err = float(jnp.abs(y - x).max())
    print(f"[bench] device={jax.devices()[0].device_kind} "
          f"roundtrip_err={err:.2e}", file=sys.stderr)
    assert err < 7e-4, "correctness gate failed"

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            y = inv(fwd(x))
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    run(3)  # settle
    n = 10
    t = run(n)
    if t < 0.5:
        n = max(10, int(n * 1.0 / t))
        t = run(n)
    best = t / n
    for _ in range(2):  # best-of-3 batches (reference bench.py style)
        t = run(n)
        best = min(best, t / n)

    fps = 1.0 / best
    vs = fps / BASELINE_FPS if BASELINE_FPS else 1.0
    print(json.dumps({
        "metric": "2D DWT+IDWT frames/s/chip (2048^2, db2, 3 levels)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
