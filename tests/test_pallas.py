"""Fused Pallas level kernels vs the jnp oracle (interpret mode on CPU).

Mirrors the reference's differential strategy (SURVEY.md §4): every subband
of the fused analysis kernel must match the two-pass jnp path, and the
fused round trip must reconstruct the image, across filter lengths, odd
band geometries, and batched inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import dwt
from pypwt_tpu.ops import pallas_dwt as pk

WAVELETS = ["haar", "db2", "db8", "sym5", "coif2", "bior3.5", "rbio2.4"]


def _rand(shape):
    return jnp.asarray(
        np.random.default_rng(42).random(shape, dtype=np.float32))


@pytest.mark.parametrize("wname", WAVELETS)
@pytest.mark.parametrize("shape", [(64, 128), (128, 64), (256, 256)])
def test_fused_analysis_matches_jnp(wname, shape):
    fb = get_filter_bank(wname)
    x = _rand(shape)
    ref = dwt.dwt2d(x, fb)
    got = pk.dwt2d_fused(x, fb)
    assert got is not None
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", WAVELETS)
def test_fused_roundtrip(wname):
    fb = get_filter_bank(wname)
    shape = (128, 256)
    x = _rand(shape)
    c = pk.dwt2d_fused(x, fb)
    y = pk.idwt2d_fused(*c, fb, shape)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 5e-6


def test_fused_batched_vmap():
    fb = get_filter_bank("db3")
    x = _rand((3, 64, 128))
    ref = dwt.dwt2d(x, fb)
    got = pk.dwt2d_fused(x, fb)
    assert got is not None
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = pk.idwt2d_fused(*got, fb, x.shape)
    assert float(jnp.abs(y - x).max()) < 5e-6


@pytest.mark.parametrize("wname", WAVELETS)
@pytest.mark.parametrize("geom", [(64, 256, 32, 128), (128, 512, 64, 256),
                                  (64, 384, 32, 128)])
def test_colsplit_analysis_matches_jnp(wname, geom):
    """Column-split grid (wide images whose full-width band is
    VMEM-infeasible) must agree with the jnp oracle for every subband —
    the lane-axis periodic wrap crosses grid programs here."""
    nr, nc, ib, cb = geom
    fb = get_filter_bank(wname)
    f = pk._build_dwt2d_colsplit(nr, nc, pk._taps(fb.dec_lo),
                                 pk._taps(fb.dec_hi), ib, cb, True)
    assert f is not None
    x = _rand((nr, nc))
    ref = dwt.dwt2d(x, fb)
    for g, r in zip(f(x), ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


def test_colsplit_geometry_gates():
    fb = get_filter_bank("db2")
    taps = (pk._taps(fb.dec_lo), pk._taps(fb.dec_hi))
    # cb must split the width strictly and on 128-lane boundaries
    assert pk._build_dwt2d_colsplit(64, 256, *taps, 32, 256, True) is None
    assert pk._build_dwt2d_colsplit(64, 256, *taps, 32, 96, True) is None
    # row band must tile the height
    assert pk._build_dwt2d_colsplit(96, 256, *taps, 64, 128, True) is None


def test_wide_image_dispatch_routes_colsplit():
    """At widths where the full-width ib=1024 band is VMEM-infeasible
    (nc >= 4096) the analysis dispatch must route through the
    column-split grid and still match the jnp oracle."""
    fb = get_filter_bank("db2")
    from pypwt_tpu.core import conv
    lp, rp = conv.analysis_pads(fb.hlen)
    # the branch condition holds: full-width tops out below ib=1024 ...
    ib, _ = pk._pick_bands(1024, 4096, lp, rp, n_bufs=5, max_body=1024,
                           budget=52 * 1024 * 1024)
    assert ib < 1024
    # ... and the colsplit geometry builds, so dispatch takes it
    assert pk._build_dwt2d_colsplit(1024, 4096, pk._taps(fb.dec_lo),
                                    pk._taps(fb.dec_hi), 1024, 2048,
                                    True) is not None
    f = pk._build_dwt2d(1024, 4096, pk._taps(fb.dec_lo),
                        pk._taps(fb.dec_hi), True)
    assert f is not None
    x = _rand((1024, 4096))
    ref = dwt.dwt2d(x, fb)
    got = pk.dwt2d_fused(x, fb)
    assert got is not None
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


def test_fallback_on_odd_sizes():
    fb = get_filter_bank("db2")
    assert pk.dwt2d_fused(_rand((63, 128)), fb) is None
    assert pk.dwt2d_fused(_rand((64, 127)), fb) is None


def test_dispatch_mode_switch():
    fb = get_filter_bank("db4")
    x = _rand((64, 64))
    dwt.set_kernels("jnp")
    ref = dwt.dwt2d(x, fb)
    dwt.set_kernels("pallas")
    got = dwt.dwt2d(x, fb)
    dwt.set_kernels("auto")
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", ["haar", "db2", "sym5"])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_fused_swt_level_matches_jnp(wname, level):
    from pypwt_tpu.core import swt
    fb = get_filter_bank(wname)
    x = _rand((64, 128))
    want = swt.swt2d_level(x, fb, level)
    got = pk.swt2d_level_fused(x, fb, level)
    assert got is not None
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    back_w = swt.iswt2d_level(*[w.astype(jnp.float32) for w in want],
                              fb, level)
    back_g = pk.iswt2d_level_fused(*got, fb, level)
    assert back_g is not None
    assert float(jnp.abs(back_g - back_w.astype(jnp.float32)).max()) < 2e-5


def test_fused_swt_full_roundtrip():
    from pypwt_tpu.core import swt, dwt
    fb = get_filter_bank("db3")
    x = _rand((64, 64))
    dwt.set_kernels("pallas")
    pyr = swt.swt2d(x, fb, 2)
    y = swt.iswt2d(pyr, fb)
    dwt.set_kernels("auto")
    assert float(jnp.abs(y - x).max()) < 5e-6


@pytest.mark.parametrize("wname", ["haar", "db2", "db7"])
def test_fused_batched1d_matches_jnp(wname):
    from pypwt_tpu.core import conv
    fb = get_filter_bank(wname)
    x = _rand((64, 256))
    want = conv.analysis_last(x, fb.dec_lo, fb.dec_hi)
    got = pk.dwt1d_fused(x, fb)
    assert got is not None
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = pk.idwt1d_fused(*got, fb, 256)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 5e-6


def test_fused_batched1d_multilevel_roundtrip():
    from pypwt_tpu.core import dwt
    fb = get_filter_bank("sym4")
    x = _rand((64, 512))
    dwt.set_kernels("pallas")
    pyr = dwt.wavedec1(x, fb, 3)
    y = dwt.waverec1(pyr, fb, 512)
    dwt.set_kernels("auto")
    assert float(jnp.abs(y - x).max()) < 5e-6


@pytest.mark.parametrize("wname", ["haar", "db3"])
@pytest.mark.parametrize("level", [1, 2])
def test_fused_swt1d_level(wname, level):
    from pypwt_tpu.core import conv
    fb = get_filter_bank(wname)
    x = _rand((64, 256))
    want = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level)
    got = pk.swt1d_level_fused(x, fb, level)
    assert got is not None
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    bw = conv.swt_synthesis_last(*[w.astype(jnp.float32) for w in want],
                                 fb.rec_lo, fb.rec_hi, level)
    bg = pk.iswt1d_level_fused(*got, fb, level)
    assert float(jnp.abs(bg - bw).max()) < 2e-5


def test_fused_swt1d_multilevel_roundtrip():
    from pypwt_tpu.core import swt, dwt
    fb = get_filter_bank("db2")
    x = _rand((32, 128))
    dwt.set_kernels("pallas")
    pyr = swt.swt1d(x, fb, 3)
    y = swt.iswt1d(pyr, fb)
    dwt.set_kernels("auto")
    assert float(jnp.abs(y - x).max()) < 5e-6
