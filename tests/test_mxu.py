"""Banded MXU-dot kernels vs the jnp oracle (interpret mode on CPU).

The block matrices are built straight from the reference index algebra
(ops/mxu_dwt.py); these tests verify them against conv.analysis_core /
conv.synthesis_core on random data, then run the fused kernels
differentially against the two-pass jnp path, mirroring tests/test_pallas.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import conv, dwt
from pypwt_tpu.ops import mxu_dwt as mx

WIDE = ["db4", "sym8", "coif3", "bior4.4", "rbio3.5", "db10"]


def _rand(shape):
    return jnp.asarray(
        np.random.default_rng(7).random(shape, dtype=np.float32))


@pytest.mark.parametrize("wname", ["db2", "sym8", "bior4.4", "db10"])
def test_analysis_matrix_matches_conv(wname):
    fb = get_filter_bank(wname)
    for b in (mx._ana_blocks(fb.hlen), 5, 1):
        D, K = mx.analysis_matrix(fb.dec_lo, fb.dec_hi, b)
        xp = np.random.default_rng(1).random((K, 16))
        lo, hi = conv.analysis_core(jnp.asarray(xp.T), fb.dec_lo,
                                    fb.dec_hi, b)
        y = D.astype(np.float64) @ xp
        assert np.abs(y[:b] - np.asarray(lo).T).max() < 1e-6
        assert np.abs(y[b:] - np.asarray(hi).T).max() < 1e-6


@pytest.mark.parametrize("wname", ["db2", "sym8", "bior4.4", "db10"])
def test_synthesis_matrix_matches_conv(wname):
    fb = get_filter_bank(wname)
    hlen = fb.hlen
    c = (hlen // 2) // 2
    for m in (mx._syn_blocks(hlen), 5, 1):
        S, Kp = mx.synthesis_matrix(fb.rec_lo, fb.rec_hi, m)
        rng = np.random.default_rng(2)
        lop = rng.random((Kp, 16))
        hip = rng.random((Kp, 16))
        # conv.synthesis_core wants lpad = c on the left; the matrix is
        # extracted with slices starting at the padded origin, so feed
        # the same windows along the last axis.
        out = conv.synthesis_core(jnp.asarray(lop.T), jnp.asarray(hip.T),
                                  fb.rec_lo, fb.rec_hi, 2 * m, m, c)
        y = S.astype(np.float64) @ np.concatenate([lop, hip], axis=0)
        assert np.abs(y - np.asarray(out).T).max() < 1e-6


@pytest.mark.parametrize("wname", WIDE)
@pytest.mark.parametrize("shape", [(64, 128), (128, 64), (256, 256)])
def test_mxu_analysis_matches_jnp(wname, shape):
    fb = get_filter_bank(wname)
    x = _rand(shape)
    dwt.set_kernels("jnp")
    try:
        ref = dwt.dwt2d(x, fb)
    finally:
        dwt.set_kernels("auto")
    got = mx.dwt2d_fused_mxu(x, fb)
    assert got is not None
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", WIDE)
def test_mxu_roundtrip(wname):
    fb = get_filter_bank(wname)
    shape = (128, 256)
    x = _rand(shape)
    c = mx.dwt2d_fused_mxu(x, fb)
    assert c is not None
    y = mx.idwt2d_fused_mxu(*c, fb, shape)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 5e-6


def test_mxu_batched_vmap():
    fb = get_filter_bank("sym8")
    x = _rand((3, 64, 128))
    dwt.set_kernels("jnp")
    try:
        ref = dwt.dwt2d(x, fb)
    finally:
        dwt.set_kernels("auto")
    got = mx.dwt2d_fused_mxu(x, fb)
    assert got is not None
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = mx.idwt2d_fused_mxu(*got, fb, x.shape)
    assert float(jnp.abs(y - x).max()) < 5e-6


def test_mxu_fallbacks():
    fb = get_filter_bank("sym8")
    assert mx.dwt2d_fused_mxu(_rand((63, 128)), fb) is None
    assert mx.dwt2d_fused_mxu(_rand((64, 127)), fb) is None
    # haar/db2 are below the MXU block design's minimum (hlen >= 4 and
    # the dispatch threshold routes them to the VPU kernels anyway)
    assert mx.dwt2d_fused_mxu(_rand((64, 128)),
                              get_filter_bank("haar")) is None


def test_mxu_dispatch_mode():
    fb = get_filter_bank("sym8")
    x = _rand((64, 64))
    try:
        dwt.set_kernels("jnp")
        ref = dwt.dwt2d(x, fb)
        dwt.set_kernels("mxu")
        got = dwt.dwt2d(x, fb)
    finally:
        dwt.set_kernels("auto")
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", ["db4", "sym8"])
def test_mxu_batched1d_matches_jnp(wname):
    fb = get_filter_bank(wname)
    x = _rand((64, 256))
    want = conv.analysis_last(x, fb.dec_lo, fb.dec_hi)
    got = mx.dwt1d_fused_mxu(x, fb)
    assert got is not None
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = mx.idwt1d_fused_mxu(*got, fb, 256)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 5e-6


def test_mxu_multilevel_full_transform():
    fb = get_filter_bank("coif3")
    x = _rand((256, 256))
    dwt.set_kernels("mxu")
    try:
        pyr = dwt.wavedec2(x, fb, 3)
        y = dwt.waverec2(pyr, fb, x.shape)
    finally:
        dwt.set_kernels("auto")
    assert float(jnp.abs(y - x).max()) < 1e-5


@pytest.mark.parametrize("wname", ["db4", "sym8", "db8"])
def test_mxu_long1d_matches_jnp(wname):
    """Folded long-1D banded-MXU kernels vs the jnp folded path.  Wide
    banks are the whole point: the VPU long builders decline them
    (per-tap VMEM blowup), so before these kernels they fell back to the
    jnp fold."""
    fb = get_filter_bank(wname)
    n = 1 << 16
    x = _rand(n)
    rc = conv.long1d_shape(n)
    want = conv.analysis_long1d(x, fb.dec_lo, fb.dec_hi, rc)
    got = mx.dwt1d_long_fused_mxu(x, fb, rc)
    assert got is not None, wname
    for g, w in zip(got, want):
        assert float(jnp.abs(g - w).max()) < 2e-5, wname
    rc_half = conv.long1d_shape(n // 2)
    y = mx.idwt1d_long_fused_mxu(got[0], got[1], fb, n, rc_half)
    assert y is not None, wname
    yw = conv.synthesis_long1d(want[0], want[1], fb.rec_lo, fb.rec_hi,
                               n, rc_half)
    assert float(jnp.abs(y - yw).max()) < 2e-5, wname
    assert float(jnp.abs(y - x).max()) < 7e-4, wname


def test_mxu_long1d_dispatch_wide_bank():
    """dwt1d/idwt1d on a long signal with a wide bank route through the
    MXU folded kernels (auto mode) and roundtrip within the envelope."""
    fb = get_filter_bank("sym8")
    n = 1 << 16
    x = _rand(n)
    pyr = dwt.wavedec1(x, fb, 4)
    y = dwt.waverec1(pyr, fb, n)
    assert float(jnp.abs(y - x).max()) < 7e-4


FULL = __import__("os").environ.get("PYPWT_FULL_SWEEP", "") == "1"


@pytest.mark.skipif(not FULL, reason="set PYPWT_FULL_SWEEP=1")
@pytest.mark.parametrize(
    "wname",
    [n for n in __import__("pypwt_tpu").wavelist()
     if get_filter_bank(n).hlen >= 6])
def test_sweep_mxu_long1d_matches_jnp(wname):
    """Every wide bank through the forced-MXU folded long-1D path
    (wavedec1 L2 + roundtrip) vs the jnp fold."""
    import jax
    fb = get_filter_bank(wname)
    n = 1 << 16
    x = _rand(n)
    try:
        dwt.set_kernels("jnp")
        ref = dwt.wavedec1(x, fb, 2)
        dwt.set_kernels("mxu")
        got = dwt.wavedec1(x, fb, 2)
        y = dwt.waverec1(got, fb, n)
    finally:
        dwt.set_kernels("auto")
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 5e-5
    assert float(jnp.abs(y - x).max()) < 7e-4


def test_mxu_bf16_precision_mode_plumbing():
    """set_mxu_precision('bf16') reroutes every forced-MXU path through
    freshly-keyed builders (single-pass DEFAULT dots).  On the CPU
    backend dot precision does not change the arithmetic, so the
    roundtrip stays exact; on TPU this mode trades ~1% relative error
    for ~6x MXU rate (measured in bench_suite)."""
    fb = get_filter_bank("sym8")
    x = _rand((64, 64))
    try:
        dwt.set_kernels("mxu")
        dwt.set_mxu_precision("bf16")
        pyr = dwt.wavedec2(x, fb, 2)
        y = dwt.waverec2(pyr, fb, (64, 64))
    finally:
        dwt.set_mxu_precision("highest")
        dwt.set_kernels("auto")
    assert float(jnp.abs(y - x).max()) < 7e-4
    with pytest.raises(ValueError):
        dwt.set_mxu_precision("fp8")
    assert dwt.mxu_precision() == "highest"
