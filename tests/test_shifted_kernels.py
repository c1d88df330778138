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


# small row shifts ride the halo blocks (spin shifts are reduced mod
# 2^levels by the pipeline); column shifts are unrestricted (full-width
# in-VMEM lane roll)
SHIFTS = [(0, 0), (1, 1), (2, 3), (7, 5), (8, 8), (1, 127), (6, 77)]


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


def test_shifted_analysis_declines_row_shift_beyond_halo():
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    assert pk.dwt2d_fused_shifted(x, fb, 127, 1) is None


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


def test_thresh_fused_analysis_and_acc_synthesis():
    """In-kernel threshold epilogue and fused spin accumulator match the
    unfused formulation."""
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    beta = 0.7
    got = pk.dwt2d_fused_shifted(x, fb, 3, 5, thresh_mode="soft",
                                 beta=beta)
    assert got is not None
    a, h, v, d = dwt.dwt2d(jnp.roll(x, (3, 5), (-2, -1)), fb)
    st = lambda t: jnp.sign(t) * jnp.maximum(jnp.abs(t) - beta, 0)
    for g, r in zip(got, (a, st(h), st(v), st(d))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-5)

    acc = _f32((128, 128))
    a4, h4, v4, d4 = (_f32((64, 64)) for _ in range(4))
    out = pk.idwt2d_fused_unshift(a4, h4, v4, d4, fb, (128, 128), 3, 5,
                                  acc=acc)
    assert out is not None
    ref = acc + jnp.roll(dwt.idwt2d(a4, h4, v4, d4, fb, (128, 128)),
                         (-3, -5), (-2, -1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


def test_static_pipeline_normalize_and_hard_match_roll_path():
    x = _f32((128, 128))
    shifts = ((1, 2), (3, 0))
    for kwargs in ({"normalize": True}, {"hard": True},
                   {"threshold_appcoeffs": True, "normalize": True}):
        dwt.set_kernels("pallas")
        try:
            got = pipeline.denoise2d_cycle_spinning(
                x, "db3", 3, 0.4, shifts=shifts, **kwargs)
        finally:
            dwt.set_kernels("auto")
        pipeline.denoise2d_cycle_spinning.clear_cache()
        dwt.set_kernels("jnp")
        try:
            want = pipeline.denoise2d_cycle_spinning(
                x, "db3", 3, 0.4, shifts=shifts, **kwargs)
        finally:
            dwt.set_kernels("auto")
        pipeline.denoise2d_cycle_spinning.clear_cache()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


@pytest.mark.parametrize("wname", ["db2", "sym4"])
@pytest.mark.parametrize("shift", [(0, 0), (1, 1), (2, 3), (7, 5),
                                   (3, 7), (6, 2)])
def test_dynshift_analysis_matches_rolled(wname, shift):
    """The dynamic-shift kernel (traced sr, sc) must equal
    analysis-of-rolled-image for every shift in [0, smax]."""
    fb = get_filter_bank(wname)
    x = _f32((128, 128))
    sr, sc = shift
    got = pk.dwt2d_fused_dynshift(x, fb, jnp.asarray(sr),
                                  jnp.asarray(sc), smax=7)
    assert got is not None
    ref = dwt.dwt2d(jnp.roll(x, (sr, sc), (-2, -1)), fb)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-5)


@pytest.mark.parametrize("wname", ["db2", "db4"])
@pytest.mark.parametrize("shift", [(0, 0), (1, 1), (2, 3), (7, 5),
                                   (4, 6)])
def test_dynunshift_synthesis_matches_unrolled(wname, shift):
    fb = get_filter_bank(wname)
    shape = (128, 128)
    sr, sc = shift
    a, h, v, d = (_f32((64, 64)) for _ in range(4))
    got = pk.idwt2d_fused_dynunshift(a, h, v, d, fb, shape,
                                     jnp.asarray(sr), jnp.asarray(sc),
                                     smax=7)
    assert got is not None
    ref = jnp.roll(dwt.idwt2d(a, h, v, d, fb, shape), (-sr, -sc),
                   (-2, -1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)


def test_dynshift_roundtrip_thresh_and_acc():
    """Dynamic roundtrip recovers the image; in-kernel threshold and
    accumulator epilogues match the unfused formulation."""
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    for sr, sc in ((3, 4), (5, 7), (0, 2)):
        c = pk.dwt2d_fused_dynshift(x, fb, jnp.asarray(sr),
                                    jnp.asarray(sc), smax=7)
        y = pk.idwt2d_fused_dynunshift(*c, fb, x.shape, jnp.asarray(sr),
                                       jnp.asarray(sc), smax=7)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=3e-5)

    beta = 0.7
    got = pk.dwt2d_fused_dynshift(x, fb, jnp.asarray(3), jnp.asarray(5),
                                  smax=7, thresh_mode="soft", beta=beta)
    assert got is not None
    a, h, v, d = dwt.dwt2d(jnp.roll(x, (3, 5), (-2, -1)), fb)
    st = lambda t: jnp.sign(t) * jnp.maximum(jnp.abs(t) - beta, 0)
    for g, r in zip(got, (a, st(h), st(v), st(d))):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-5)

    acc = _f32((128, 128))
    a4, h4, v4, d4 = (_f32((64, 64)) for _ in range(4))
    out = pk.idwt2d_fused_dynunshift(a4, h4, v4, d4, fb, (128, 128),
                                     jnp.asarray(3), jnp.asarray(5),
                                     smax=7, acc=acc, scale=0.25)
    assert out is not None
    ref = (acc + jnp.roll(dwt.idwt2d(a4, h4, v4, d4, fb, (128, 128)),
                          (-3, -5), (-2, -1))) * 0.25
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


@pytest.mark.parametrize("idx", [0, 1, 2, 3])
def test_phase_switch_matches_static(idx):
    """The 4-way phase switch (traced phase bits) must equal the static
    kernel it selects, for analysis and unshifting synthesis."""
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    pr, pc = idx // 2, idx % 2
    got = pk.dwt2d_fused_phase_switch(x, fb, jnp.int32(idx))
    assert got is not None
    ref = pk.dwt2d_fused_shifted(x, fb, pr, pc)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6)
    a, h, v, d = (_f32((64, 64)) for _ in range(4))
    gy = pk.idwt2d_fused_phase_switch(a, h, v, d, fb, (128, 128),
                                      jnp.int32(idx))
    ry = pk.idwt2d_fused_unshift(a, h, v, d, fb, (128, 128), pr, pc)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               atol=1e-6)


def test_random_pipeline_matches_roll_path():
    """Random-mode cycle spinning through the fused dynamic-shift
    kernels must equal the roll-based scan path for the same key — the
    mod-2^levels shift reduction is exact (the periodized pyramid
    commutes with 2^L translations and thresholding is pointwise)."""
    x = _f32((128, 128))
    key = jax.random.key(42)
    dwt.set_kernels("pallas")  # activate the fused dynamic path on CPU
    try:
        got = pipeline.denoise2d_cycle_spinning(
            x, "db2", 2, 0.1, key=key, n_spins=3)
    finally:
        dwt.set_kernels("auto")
    pipeline.denoise2d_cycle_spinning.clear_cache()
    dwt.set_kernels("jnp")  # roll-based scan fallback
    try:
        want = pipeline.denoise2d_cycle_spinning(
            x, "db2", 2, 0.1, key=key, n_spins=3)
    finally:
        dwt.set_kernels("auto")
    pipeline.denoise2d_cycle_spinning.clear_cache()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5)


def test_multishift_kernels_match_per_spin():
    """The one-pass multi-spin kernels equal the per-spin formulation."""
    fb = get_filter_bank("db2")
    x = _f32((128, 128))
    shifts = ((0, 0), (2, 1), (4, 2), (6, 3))
    got = pk.dwt2d_fused_multishift(x, fb, shifts)
    assert got is not None
    for (sr, sc), planes in zip(shifts, got):
        ref = dwt.dwt2d(jnp.roll(x, (sr, sc), (-2, -1)), fb)
        for g, r in zip(planes, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=3e-5)

    sets = [tuple(_f32((64, 64)) for _ in range(4)) for _ in shifts]
    out = pk.idwt2d_fused_multiunshift(sets, fb, (128, 128), shifts,
                                       scale=0.25)
    assert out is not None
    acc = sum(jnp.roll(dwt.idwt2d(*s, fb, (128, 128)), (-sr, -sc),
                       (-2, -1))
              for s, (sr, sc) in zip(sets, shifts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(acc) * 0.25,
                               atol=3e-5)
