"""Random-mode cycle spinning through the dynamic-shift kernels vs the
static-shift mode and the old roll path, on the chip (round 5).

VERDICT r4 next #5 acceptance: denoise_cycle_spin4 (random) <= 1.1x the
static-shift mode, same error envelope, seeded reproducibility kept.

Run on the real TPU:  python tools/proto_dynspin.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    import jax
    import jax.numpy as jnp
    from pypwt_tpu.utils import profiling
    from pypwt_tpu.utils.profiling import timeit_chained, make_inputs
    from pypwt_tpu import pipeline as pl_

    profiling.enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".jax_cache_tpu"))

    n = 2048
    x0 = make_inputs((n, n))[0] * 255.0
    key = jax.random.key(7)

    def rand4(v):
        return pl_.denoise2d_cycle_spinning(v, "db2", 3, 1.0, key,
                                            n_spins=4)

    def static4(v):
        return pl_.denoise2d_cycle_spinning(
            v, "db2", 3, 1.0, shifts=((0, 0), (2, 1), (4, 2), (6, 3)))

    rows = {}
    # correctness: fused random mode == roll-scan for the same key
    got = jax.jit(rand4)(x0)
    from pypwt_tpu.core import dwt
    pl_.denoise2d_cycle_spinning.clear_cache()
    dwt.set_kernels("jnp")
    try:
        want = jax.jit(lambda v: pl_.denoise2d_cycle_spinning(
            v, "db2", 3, 1.0, key, n_spins=4))(x0)
    finally:
        dwt.set_kernels("auto")
    pl_.denoise2d_cycle_spinning.clear_cache()
    rows["rand_vs_rollscan_maxerr"] = float(
        jax.jit(lambda a, b: jnp.abs(a - b).max())(got, want))

    for name, fn in (("rand4", rand4), ("static4", static4)):
        try:
            rows[name + "_us"] = round(
                timeit_chained(fn, x0, iters=32) * 1e6, 1)
        except Exception as e:
            rows[name + "_us"] = f"ERR:{type(e).__name__}: {e}"
    if isinstance(rows.get("rand4_us"), float) and \
            isinstance(rows.get("static4_us"), float):
        rows["ratio"] = round(rows["rand4_us"] / rows["static4_us"], 3)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
