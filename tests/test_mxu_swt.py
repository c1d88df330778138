"""Banded MXU a-trous kernels vs the jnp oracle (interpret mode on CPU).

The dilated block matrices are built straight from the reference a-trous
index algebra (ops/mxu_swt.py); these tests verify them against
conv.swt_analysis_last / conv.swt_synthesis_last on random data, then
run the fused kernels differentially against the jnp path, mirroring
tests/test_mxu.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import conv, dwt, swt
from pypwt_tpu.ops import mxu_swt as mxs

WIDE = ["db4", "sym8", "coif3", "bior4.4", "db10"]


def _rand(shape):
    return jnp.asarray(
        np.random.default_rng(7).random(shape, dtype=np.float32))


@pytest.mark.parametrize("wname", ["db2", "sym8", "db10"])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_swt_analysis_matrix_matches_conv(wname, level):
    fb = get_filter_bank(wname)
    hlen = fb.hlen
    t = 1 << (level - 1)
    s = hlen // 2
    lpad = (hlen - 1 - s) * t
    for b in (24, 5, 1):
        D, K = mxs.swt_analysis_matrix(fb.dec_lo, fb.dec_hi, b, level)
        xp = np.random.default_rng(1).random((K, 16))
        flo = np.asarray(fb.dec_lo, np.float64)
        fhi = np.asarray(fb.dec_hi, np.float64)
        want_lo = np.zeros((b, 16))
        want_hi = np.zeros((b, 16))
        for i in range(b):
            for k in range(hlen):
                j = lpad + (s - k) * t + i
                want_lo[i] += flo[k] * xp[j]
                want_hi[i] += fhi[k] * xp[j]
        y = D.astype(np.float64) @ xp
        assert np.abs(y[:b] - want_lo).max() < 1e-6
        assert np.abs(y[b:] - want_hi).max() < 1e-6


@pytest.mark.parametrize("wname", ["db2", "sym8"])
@pytest.mark.parametrize("level", [1, 2])
def test_swt_synthesis_matrix_matches_conv(wname, level):
    """S applied to periodically padded full-length planes must equal
    conv.swt_synthesis_last."""
    fb = get_filter_bank(wname)
    hlen = fb.hlen
    t = 1 << (level - 1)
    s = hlen // 2 - 1 if hlen % 2 == 0 else hlen // 2
    lpad, rpad = (hlen - 1 - s) * t, max(s, 0) * t
    n = 64
    rng = np.random.default_rng(2)
    lo = rng.random((n, 8))
    hi = rng.random((n, 8))
    want = conv.swt_synthesis_last(
        jnp.asarray(lo.T), jnp.asarray(hi.T),
        fb.rec_lo, fb.rec_hi, level)
    b = 16
    S, K = mxs.swt_synthesis_matrix(fb.rec_lo, fb.rec_hi, b, level)
    lop = np.concatenate([lo[n - lpad:], lo, lo[:rpad]], axis=0)
    hip = np.concatenate([hi[n - lpad:], hi, hi[:rpad]], axis=0)
    got = np.zeros((n, 8))
    for q in range(n // b):
        z = np.concatenate([lop[b * q: b * q + K],
                            hip[b * q: b * q + K]], axis=0)
        got[b * q: b * q + b] = S.astype(np.float64) @ z
    assert np.abs(got - np.asarray(want).T).max() < 1e-6


@pytest.mark.parametrize("wname", WIDE)
@pytest.mark.parametrize("shape", [(64, 128), (128, 64), (256, 256)])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_mxu_swt2d_matches_jnp(wname, shape, level):
    fb = get_filter_bank(wname)
    x = _rand(shape)
    got = mxs.swt2d_level_fused_mxu(x, fb, level)
    lp, rp, _, _ = __import__(
        "pypwt_tpu.ops.pallas_dwt", fromlist=["x"])._swt_pads(
            fb.hlen, level, inverse=False)
    if max(lp, rp) > min(shape):
        assert got is None
        return
    assert got is not None
    t1, t2 = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level), None
    lo_r, hi_r = t1
    ref = []
    for src in (lo_r, hi_r):
        st = jnp.swapaxes(src, -1, -2)
        a_, b_ = conv.swt_analysis_last(st, fb.dec_lo, fb.dec_hi, level)
        ref.append(jnp.swapaxes(a_, -1, -2))
        ref.append(jnp.swapaxes(b_, -1, -2))
    # conv order: (a, h) from lo, (v, d) from hi -> fused returns a,h,v,d
    want = (ref[0], ref[1], ref[2], ref[3])
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", WIDE)
@pytest.mark.parametrize("level", [1, 2])
def test_mxu_swt2d_roundtrip(wname, level):
    fb = get_filter_bank(wname)
    x = _rand((128, 256))
    c = mxs.swt2d_level_fused_mxu(x, fb, level)
    assert c is not None
    y = mxs.iswt2d_level_fused_mxu(*c, fb, level)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 1e-5


@pytest.mark.parametrize("wname", ["sym8"])
def test_mxu_swt2d_multilevel_dispatch(wname):
    """Full swt2d/iswt2d through the kernel dispatch in 'mxu' mode
    matches the jnp path."""
    fb = get_filter_bank(wname)
    x = _rand((128, 128))
    try:
        dwt.set_kernels("jnp")
        ref = swt.swt2d(x, fb, 2)
        refy = swt.iswt2d([c for c in ref], fb)
        dwt.set_kernels("mxu")
        got = swt.swt2d(x, fb, 2)
        goty = swt.iswt2d([c for c in got], fb)
    finally:
        dwt.set_kernels("auto")
    flat_r = [ref[0]] + [p for lv in ref[1:] for p in lv]
    flat_g = [got[0]] + [p for lv in got[1:] for p in lv]
    for g, r in zip(flat_g, flat_r):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 5e-5
    assert float(jnp.abs(goty - refy.astype(jnp.float32)).max()) < 5e-5
    assert float(jnp.abs(goty - x).max()) < 5e-5


def test_mxu_swt2d_batched_vmap():
    fb = get_filter_bank("sym8")
    x = _rand((3, 64, 128))
    got = mxs.swt2d_level_fused_mxu(x, fb, 1)
    assert got is not None
    for g in got:
        assert g.shape == x.shape
    y = mxs.iswt2d_level_fused_mxu(*got, fb, 1)
    assert float(jnp.abs(y - x).max()) < 1e-5


@pytest.mark.parametrize("wname", ["db4", "sym8"])
@pytest.mark.parametrize("level", [1, 2, 3])
def test_mxu_swt1d_matches_jnp(wname, level):
    fb = get_filter_bank(wname)
    x = _rand((64, 256))
    want = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level)
    got = mxs.swt1d_level_fused_mxu(x, fb, level)
    assert got is not None
    for g, r in zip(got, want):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = mxs.iswt1d_level_fused_mxu(*got, fb, level)
    assert y is not None
    yref = conv.swt_synthesis_last(want[0], want[1], fb.rec_lo,
                                   fb.rec_hi, level)
    assert float(jnp.abs(y - yref.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("wname", ["sym8", "db10"])
@pytest.mark.parametrize("level", [4, 5])
def test_mxu_swt2d_polyphase_deep_levels(wname, level):
    """Deep dilations run the polyphase (compact, K = b + hlen - 1)
    formulation — the reshape trick must reproduce the dilated oracle
    exactly where the old banded form had its K-cliff."""
    fb = get_filter_bank(wname)
    shape = (256, 512)
    lp, rp, _, _ = __import__(
        "pypwt_tpu.ops.pallas_dwt", fromlist=["x"])._swt_pads(
            fb.hlen, level, inverse=False)
    x = _rand(shape)
    if max(lp, rp) > min(shape):
        pytest.skip("support exceeds image")
    got = mxs.swt2d_level_fused_mxu(x, fb, level)
    assert got is not None
    lo_r, hi_r = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level)
    ref = []
    for src in (lo_r, hi_r):
        st = jnp.swapaxes(src, -1, -2)
        a_, b_ = conv.swt_analysis_last(st, fb.dec_lo, fb.dec_hi, level)
        ref.append(jnp.swapaxes(a_, -1, -2))
        ref.append(jnp.swapaxes(b_, -1, -2))
    for g, r in zip(got, ref):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 2e-5
    y = mxs.iswt2d_level_fused_mxu(*got, fb, level)
    if y is None:  # synthesis band geometry may decline (VMEM budget)
        pytest.skip("synthesis geometry declined")
    assert float(jnp.abs(y - x).max()) < 2e-5


def test_mxu_swt2d_polyphase_falls_back_banded():
    """A transform length not divisible by the dilation declines the
    polyphase reshape and still matches the oracle via the banded form."""
    from pypwt_tpu.ops import mxu_swt as m
    # non-divisible length -> banded regardless of span
    assert m._poly_t(4, 64, 102, hlen=16) == 1
    # span past the banded cliff and divisible -> polyphase
    assert m._poly_t(4, 64, 128, hlen=16) == 8
    # level 1 is already compact
    assert m._poly_t(1, 64, 128, hlen=16) == 1
    # small span: banded is faster than paying the reshape relayouts
    assert m._poly_t(2, 64, 128, hlen=8) == 1
    # bf16 banded dots have no cliff -> never polyphase
    assert m._poly_t(4, 64, 128, hlen=16, prec="bf16") == 1
    # synthesis cliff comes earlier
    assert m._poly_t(3, 64, 128, hlen=16, synthesis=True) == 4
    assert m._poly_t(3, 64, 128, hlen=16) == 1
    fb = get_filter_bank("sym8")
    x = _rand((64, 102))
    got = mxs.swt2d_level_fused_mxu(x, fb, 3)
    if got is None:
        pytest.skip("geometry not covered")
    lo_r, hi_r = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, 3)
    st = jnp.swapaxes(lo_r, -1, -2)
    a_, _b = conv.swt_analysis_last(st, fb.dec_lo, fb.dec_hi, 3)
    want_a = jnp.swapaxes(a_, -1, -2)
    assert float(jnp.abs(got[0] - want_a.astype(jnp.float32)).max()) < 2e-5


@pytest.mark.parametrize("level", [4, 5])
def test_mxu_swt_long1d_polyphase_deep(level):
    """Deep-dilation folded long-1D a-trous through the polyphase MXU
    kernels vs the jnp fold."""
    fb = get_filter_bank("sym8")
    n = 1 << 18
    x = _rand(n)
    rc = conv.long1d_shape(n)
    if (1 << (level - 1)) % rc[1] == 0:
        pytest.skip("row-roll path")
    got = mxs.swt1d_long_fused_mxu(x, fb, level, rc)
    if got is None:
        pytest.skip("geometry declined")
    want = conv.swt_analysis_long1d(x, fb.dec_lo, fb.dec_hi, level, rc)
    for g, w in zip(got, want):
        assert float(jnp.abs(g - w).max()) < 2e-5
    bg = mxs.iswt1d_long_fused_mxu(got[0], got[1], fb, level, rc)
    bw = conv.swt_synthesis_long1d(want[0], want[1], fb.rec_lo,
                                   fb.rec_hi, level, rc)
    assert bg is not None
    assert float(jnp.abs(bg - bw).max()) < 2e-5


def test_mxu_swt_support_guard():
    """Deep dilation exceeding the image declines (jnp path wraps)."""
    fb = get_filter_bank("db10")
    assert mxs.swt2d_level_fused_mxu(_rand((32, 32)), fb, 4) is None
    assert mxs.swt1d_level_fused_mxu(_rand((8, 32)), fb, 4) is None


FULL = __import__("os").environ.get("PYPWT_FULL_SWEEP", "") == "1"


@pytest.mark.skipif(not FULL, reason="set PYPWT_FULL_SWEEP=1")
@pytest.mark.parametrize(
    "wname",
    [n for n in __import__("pypwt_tpu").wavelist()
     if get_filter_bank(n).hlen >= 6])
def test_sweep_mxu_swt_matches_jnp(wname):
    """Every wide bank (the banks auto mode routes to the MXU a-trous
    kernels) through forced-mxu swt2d L2 vs the jnp path."""
    fb = get_filter_bank(wname)
    x = _rand((64, 64))
    try:
        dwt.set_kernels("jnp")
        ref = swt.swt2d(x, fb, 2)
        dwt.set_kernels("mxu")
        got = swt.swt2d(x, fb, 2)
        y = swt.iswt2d(got, fb)
    finally:
        dwt.set_kernels("auto")
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 5e-5
    assert float(jnp.abs(y - x).max()) < 5e-5


@pytest.mark.parametrize("wname", ["db4", "sym8", "db8"])
@pytest.mark.parametrize("level", [1, 3])
def test_mxu_swt_long1d_matches_jnp(wname, level):
    """Folded long-1D a-trous MXU kernels vs the jnp folded path (wide
    banks the VPU long builders decline)."""
    fb = get_filter_bank(wname)
    n = 1 << 16
    x = _rand(n)
    rc = conv.long1d_shape(n)
    want = conv.swt_analysis_long1d(x, fb.dec_lo, fb.dec_hi, level, rc)
    got = mxs.swt1d_long_fused_mxu(x, fb, level, rc)
    assert got is not None, (wname, level)
    for g, w in zip(got, want):
        assert float(jnp.abs(g - w).max()) < 2e-5, (wname, level)
    bw = conv.swt_synthesis_long1d(want[0], want[1], fb.rec_lo,
                                   fb.rec_hi, level, rc)
    bg = mxs.iswt1d_long_fused_mxu(got[0], got[1], fb, level, rc)
    assert bg is not None, (wname, level)
    assert float(jnp.abs(bg - bw).max()) < 2e-5, (wname, level)


def test_mxu_swt_long1d_dispatch_roundtrip():
    """swt1d/iswt1d on a long signal with a wide bank go through the MXU
    folded a-trous kernels under auto dispatch."""
    fb = get_filter_bank("sym8")
    n = 1 << 16
    x = _rand(n)
    ps = swt.swt1d(x, fb, 3)
    y = swt.iswt1d(ps, fb)
    assert float(jnp.abs(y - x).max()) < 7e-4


@pytest.mark.skipif(not FULL, reason="set PYPWT_FULL_SWEEP=1")
@pytest.mark.parametrize(
    "wname",
    [n for n in __import__("pypwt_tpu").wavelist()
     if get_filter_bank(n).hlen >= 6])
def test_sweep_mxu_swt_long1d_matches_jnp(wname):
    """Every wide bank through the forced-MXU folded long-1D a-trous
    path (swt1d L2 + roundtrip) vs the jnp fold."""
    fb = get_filter_bank(wname)
    n = 1 << 16
    x = _rand(n)
    try:
        dwt.set_kernels("jnp")
        ref = swt.swt1d(x, fb, 2)
        dwt.set_kernels("mxu")
        got = swt.swt1d(x, fb, 2)
        y = swt.iswt1d(got, fb)
    finally:
        dwt.set_kernels("auto")
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert float(jnp.abs(g - r.astype(jnp.float32)).max()) < 5e-5
    assert float(jnp.abs(y - x).max()) < 7e-4


def test_swt_dispatch_crossover_table():
    """Pin the TPU-measured SWT routing rule (tools/proto_mxu_swt.py,
    2026-08-19, 1024^2 per-level chained timings; doc/performance.md
    round-4 table).  VPU for hlen<16 at every level; MXU for hlen>=16
    while the dilated support (hlen-1)*2^(level-1)+1 stays under the
    band cliff (96 analysis / 40 synthesis); bf16 mode routes every
    MXU-eligible bank to the MXU at every level (27 us flat, no cliff)."""
    from pypwt_tpu.core.swt import _mxu_swt_wanted

    cases = {
        # (wname, level) -> (analysis_mxu, synthesis_mxu)
        ("db2", 1): (False, False),    # hlen 4: VPU always
        ("db2", 4): (False, False),
        ("db4", 1): (False, False),    # hlen 8: VPU always (46.5 vs 61.1)
        ("db4", 4): (False, False),
        ("sym8", 1): (True, True),     # hlen 16 K=16: MXU (61.1 vs 86.9)
        ("sym8", 2): (True, True),     # K=31
        ("sym8", 3): (True, False),    # K=61: ana MXU 62.4, syn VPU 58.7
        ("sym8", 4): (False, False),   # K=121: past the cliff (139 us)
        ("db10", 1): (True, True),     # hlen 20 K=20
        ("db10", 2): (True, True),     # K=39: syn MXU 63.5 vs VPU 82.0
        ("db10", 3): (True, False),    # K=77: ana MXU 64.1 vs VPU 83.4
        ("db10", 4): (False, False),   # K=153
    }
    for (wname, level), (ana, syn) in cases.items():
        fb = get_filter_bank(wname)
        assert _mxu_swt_wanted(fb, level) == ana, (wname, level, "ana")
        assert _mxu_swt_wanted(fb, level, synthesis=True) == syn, (
            wname, level, "syn")

    # forced mode overrides the table
    dwt.set_kernels("mxu")
    try:
        assert _mxu_swt_wanted(get_filter_bank("db2"), 4)
    finally:
        dwt.set_kernels("auto")
    dwt.set_kernels("jnp")
    try:
        assert not _mxu_swt_wanted(get_filter_bank("db10"), 1)
    finally:
        dwt.set_kernels("auto")

    # bf16: single-pass dots, measured flat 27 us -> MXU everywhere
    # the bank is MXU-eligible at all
    dwt.set_mxu_precision("bf16")
    try:
        assert _mxu_swt_wanted(get_filter_bank("db4"), 4)
        assert _mxu_swt_wanted(get_filter_bank("db10"), 4, synthesis=True)
        assert not _mxu_swt_wanted(get_filter_bank("db2"), 1)
    finally:
        dwt.set_mxu_precision("highest")


def test_long1d_dispatch_crossover():
    """Pin the long-1D routing (4Mi-sample chained measurements,
    doc/performance.md round-5 table): the VPU scratch fold wins at
    every width it builds, so the MXU only serves the widths where the
    fold kernels would blow VMEM and decline — DWT long from hlen>=18,
    SWT long from hlen>=22."""
    from pypwt_tpu.core.dwt import _mxu_long_wanted
    from pypwt_tpu.core.swt import _mxu_swt_long_wanted

    for wname, dwt_mxu, swt_mxu in [
            ("db2", False, False), ("db4", False, False),
            ("db5", False, False), ("db6", False, False),
            ("sym8", False, False), ("db9", True, False),
            ("db10", True, False), ("db12", True, True)]:
        fb = get_filter_bank(wname)
        assert _mxu_long_wanted(fb) == dwt_mxu, wname
        assert _mxu_swt_long_wanted(fb) == swt_mxu, wname

    dwt.set_kernels("mxu")
    try:
        assert _mxu_long_wanted(get_filter_bank("db2"))
        assert _mxu_swt_long_wanted(get_filter_bank("db2"))
    finally:
        dwt.set_kernels("auto")
