"""Statically-shifted fused level kernels (cycle spinning, interpret
mode): dwt2d_fused_shifted must equal analysis-of-rolled-image, and
idwt2d_fused_unshift must equal unroll-of-synthesis, for even and odd
shifts in both axes; the static-shift pipeline must match the roll-based
reference spin for spin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import dwt
from pypwt_tpu.ops import pallas_dwt as pk
from pypwt_tpu import pipeline

RNG = np.random.default_rng(9)


def _f32(shape):
    return jnp.asarray(RNG.standard_normal(shape), dtype=jnp.float32)


SHIFTS = [(0, 0), (1, 1), (2, 3), (7, 5), (8, 8), (127, 1), (1, 127)]


@pytest.mark.parametrize("wname", ["db2", "sym4"])
@pytest.mark.parametrize("shift", SHIFTS)
def test_shifted_analysis_matches_rolled(wname, shift):
    fb = get_filter_bank(wname)
    x = _f32((128, 128))
    sr, sc = shift
    got = pk.dwt2d_fused_shifted(x, fb, sr, sc)
    assert got is not None
    ref = dwt.dwt2d(jnp.roll(x, (sr, sc), (-2, -1)), fb)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-5)


@pytest.mark.parametrize("wname", ["db2", "db4"])
@pytest.mark.parametrize("shift", SHIFTS)
def test_unshift_synthesis_matches_unrolled(wname, shift):
    fb = get_filter_bank(wname)
    shape = (128, 128)
    sr, sc = shift
    a, h, v, d = (_f32((64, 64)) for _ in range(4))
    got = pk.idwt2d_fused_unshift(a, h, v, d, fb, shape, sr, sc)
    assert got is not None
    ref = jnp.roll(dwt.idwt2d(a, h, v, d, fb, shape), (-sr, -sc),
                   (-2, -1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)


def test_shifted_roundtrip_recovers_image():
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    for sr, sc in ((3, 4), (5, 9)):
        c = pk.dwt2d_fused_shifted(x, fb, sr, sc)
        y = pk.idwt2d_fused_unshift(*c, fb, x.shape, sr, sc)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=3e-5)


def test_static_pipeline_matches_roll_path():
    """The fused static-shift spins must agree with the roll-based spin
    (forced by dropping to the jnp kernels) for the full averaged
    denoise."""
    x = _f32((128, 128))
    shifts = ((0, 0), (1, 1), (2, 2), (3, 3))
    dwt.set_kernels("pallas")  # activate the fused static-spin path on CPU
    try:
        got = pipeline.denoise2d_cycle_spinning(
            x, "db2", 2, 0.1, shifts=shifts)
    finally:
        dwt.set_kernels("auto")
    # the kernel-mode global is read at trace time; drop the jit cache so
    # the jnp-mode reference actually retraces
    pipeline.denoise2d_cycle_spinning.clear_cache()
    dwt.set_kernels("jnp")
    try:
        want = pipeline.denoise2d_cycle_spinning(
            x, "db2", 2, 0.1, shifts=shifts)
    finally:
        dwt.set_kernels("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5)
