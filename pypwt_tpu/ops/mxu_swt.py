"""Fused stationary (a-trous) level kernels on the MXU (Pallas / Mosaic).

The VPU a-trous kernels (ops/pallas_dwt.py::_swt2d_kernel) pay one VMEM
traversal per filter tap per pass, so wide wavelets scale linearly in
hlen (the same effect measured for the decimating kernels: sym8 2.65x
db2 at identical traffic).  Here each dilated stationary pass runs as a
sequence of banded MXU dots instead: a block of ``b`` output rows of
(lo, hi) is one fp32 dot ``D (2b, K) @ xp_slice (K, W)`` with
``K = b + (hlen-1) * 2^(level-1)`` — tap-count-independent like
ops/mxu_dwt.py, at the price of also multiplying the dilation zeros.
``b`` is chosen per (hlen, level) to minimise MXU passes per output row,
so the relative cost grows with the dilation; dispatch (core/swt.py)
routes wide filters here and keeps the VPU tap loops for short ones.

Precision: HIGHEST (six-pass ~fp32) throughout, for the same measured
reasons as ops/mxu_dwt.py (DEFAULT bf16 fails the reference's accuracy
envelope).

The banded matrices are built in float64 numpy straight from the
reference a-trous index algebra (separable.cu:409-493 analysis,
:553-626 synthesis; identical to conv.swt_analysis_last /
conv.swt_synthesis_last) and verified against conv in
tests/test_mxu_swt.py.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_dwt as pk

HIGHEST = jax.lax.Precision.HIGHEST

_VMEM_LIMIT = 100 * 1024 * 1024


def _prec():
    """Current MXU dot precision ('highest'|'bf16', core.dwt knob).
    Builders take it as an lru_cache key; _dot reads it at kernel trace
    time, which is always under a wrapper that just selected the builder
    by the same value (same thread, no user code in between)."""
    from ..core import dwt
    return dwt.mxu_precision()


def _dot(D, x):
    p = HIGHEST if _prec() == "highest" else jax.lax.Precision.DEFAULT
    return jax.lax.dot(D, x, precision=p,
                       preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Banded dilated block matrices (float64 numpy, cast to f32 constants)
# ---------------------------------------------------------------------------

def swt_analysis_matrix(dec_lo, dec_hi, b, level):
    """D (2b, K), K = b + (hlen-1)*t: rows [lo_b; hi_b] of the a-trous
    analysis map out[i] = sum_k f[k] x[i + (s-k)*t] with s = hlen//2 and
    t = 2^(level-1) (conv.swt_analysis_last / separable.cu:409-448).
    Operates on input slices padded with lpad = (hlen-1-s)*t on the
    left."""
    flo = np.asarray(dec_lo, np.float64)
    fhi = np.asarray(dec_hi, np.float64)
    hlen = len(flo)
    t = 1 << (level - 1)
    s = hlen // 2
    lpad = (hlen - 1 - s) * t
    K = b + (hlen - 1) * t
    D = np.zeros((2 * b, K), np.float64)
    for i in range(b):
        for k in range(hlen):
            j = lpad + (s - k) * t + i
            D[i, j] += flo[k]
            D[b + i, j] += fhi[k]
    return np.ascontiguousarray(D, np.float32), K


def swt_synthesis_matrix(rec_lo, rec_hi, b, level):
    """S (b, 2K), K = b + (hlen-1)*t: the a-trous synthesis map from
    stacked [lo_slice; hi_slice] to b outputs, including the reference's
    1/2-per-pass rescale (conv.swt_synthesis_last / separable.cu:553-584).
    s = hlen//2 - 1 for even hlen."""
    flo = np.asarray(rec_lo, np.float64)
    fhi = np.asarray(rec_hi, np.float64)
    hlen = len(flo)
    t = 1 << (level - 1)
    s = hlen // 2 - 1 if hlen % 2 == 0 else hlen // 2
    lpad = (hlen - 1 - s) * t
    K = b + (hlen - 1) * t
    S = np.zeros((b, 2 * K), np.float64)
    for i in range(b):
        for k in range(hlen):
            j = lpad + (s - k) * t + i
            S[i, j] += flo[k] * 0.5
            S[i, K + j] += fhi[k] * 0.5
    return np.ascontiguousarray(S, np.float32), K


def _pick_b(span, L, row_mult, k_mult):
    """Output-block size minimising MXU tile passes per output row for a
    banded matrix with ``row_mult*b`` rows and ``k_mult*(b+span)``
    contraction length; L bounds the block."""
    cap = max(8, min(512, L))
    best_b, best_c = None, None
    for b in range(8, cap + 1, 8):
        K = b + span
        c = (math.ceil(row_mult * b / 128)
             * math.ceil(k_mult * K / 128)) / b
        if best_c is None or c < best_c - 1e-12:
            best_b, best_c = b, c
    return min(best_b, L)


# ---------------------------------------------------------------------------
# Polyphase (compact) a-trous formulation.
#
# The dilated correlation out[i] = sum_k f[k] xp[i + (hlen-1-k)*t] couples
# only indices of equal residue mod t, so a dilation-t a-trous pass over a
# padded (L + (hlen-1)*t, W) plane IS a level-1 COMPACT pass over the same
# plane reshaped row-major to ((L + (hlen-1)*t)/t, t*W): reshaped row a
# holds original rows [a*t, (a+1)*t), so original row a*t + p sits at
# reshaped (a, p*W + w) and the compact correlation over a advances by
# exactly t original rows — every phase p rides along the widened lane
# axis for free.  No strided slicing, no phase loop: two contiguous
# reshapes around the existing blocked dots.
#
# This keeps the banded contraction at K = b + hlen - 1 at EVERY level.
# The round-4 measured K-cliff (banded cost ~doubling once
# K = b + (hlen-1)*2^(level-1) crossed ~100; synthesis declining from
# K ~ 40 because it re-bands two operands) was an artifact of carrying
# the dilation zeros inside the band, not a property of the chip
# (VERDICT r4 next #1).  Applies whenever t divides the transform
# length; the banded form remains as the fallback.
#
# BUT the reshape is not free on the chip: merging t sublane rows into
# the lane axis is a physical vreg relayout (and the outputs reshape
# back), costing ~20 us per 1024^2 pass (round-5 probe: db4 L2 analysis
# 81.6 us polyphase vs 61.3 banded flat; bf16 43.0 vs 26.8).  So the
# compact form is only engaged where the banded form's dilated span
# would cross its measured cliff — and NEVER in bf16 mode, whose
# single-pass banded dots showed no cliff in the measured range.
# Span thresholds are chip-measured (tools/proto_swt_poly.py, round 5).
# ---------------------------------------------------------------------------

_POLY_MIN_SPAN_ANA = 100   # banded analysis flat to span ~76, cliff >100
_POLY_MIN_SPAN_SYN = 48    # banded synthesis declines from span ~56


def _poly_t(level, *Ls, hlen=None, synthesis=False, prec="highest"):
    """The dilation 2^(level-1) if the polyphase reshape (a) applies to
    every transform length in ``Ls`` and (b) is predicted faster than
    the banded form (span past the banded cliff, f32 mode only); else 1
    (banded).  PYPWT_SWT_POLY=always|never overrides (probe knob)."""
    import os
    t = 1 << (level - 1)
    if t == 1 or any(L % t for L in Ls):
        return 1
    force = os.environ.get("PYPWT_SWT_POLY", "auto")
    if force == "always":
        return t
    if force == "never" or prec != "highest":
        return 1
    span = (hlen - 1) * t
    return t if span >= (_POLY_MIN_SPAN_SYN if synthesis
                         else _POLY_MIN_SPAN_ANA) else 1


def _mat_level(level, te):
    """Matrix dilation level: compact (1) under the polyphase reshape."""
    return 1 if te > 1 else level


def clear_builder_caches():
    """Drop every SWT MXU builder cache.  Needed after toggling the
    PYPWT_SWT_POLY probe override: the env knob is read at build time
    but is deliberately NOT part of the lru_cache keys (it exists only
    for A/B probes; production form selection is the span rule)."""
    for b in (_build_swt2d_mxu, _build_iswt2d_mxu, _build_swt1d_mxu,
              _build_iswt1d_mxu, build_swt2d_sharded_mxu,
              build_iswt2d_sharded_mxu, _build_swt1d_long_mxu,
              _build_iswt1d_long_mxu):
        b.cache_clear()


# ---------------------------------------------------------------------------
# In-kernel banded-dot a-trous passes (sublane axis)
# ---------------------------------------------------------------------------

def _swt_ana_dots(xp, Dm, Dr, b, K, L):
    """A-trous analysis on padded xp (L + span, W) -> lo, hi (L, W)."""
    los, his = [], []
    nfull = L // b
    for q in range(nfull):
        y = _dot(Dm, xp[b * q: b * q + K, :])
        los.append(y[:b, :])
        his.append(y[b:, :])
    r = L - nfull * b
    if r:
        Kr = Dr.shape[1]
        y = _dot(Dr, xp[b * nfull: b * nfull + Kr, :])
        los.append(y[:r, :])
        his.append(y[r:, :])
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    return lo, hi


def _swt_syn_dots(lop, hip, Sm, Sr, b, K, L):
    """A-trous synthesis of padded planes (L + span, W) -> (L, W)."""
    outs = []
    nfull = L // b
    for q in range(nfull):
        z = jnp.concatenate([lop[b * q: b * q + K, :],
                             hip[b * q: b * q + K, :]], axis=0)
        outs.append(_dot(Sm, z))
    r = L - nfull * b
    if r:
        Kr = Sr.shape[1] // 2
        z = jnp.concatenate([lop[b * nfull: b * nfull + Kr, :],
                             hip[b * nfull: b * nfull + Kr, :]], axis=0)
        outs.append(_dot(Sr, z))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _ana_dots_auto(xp, Dm, Dr, b, K, L, te):
    """_swt_ana_dots, through the polyphase reshape when te > 1 (the
    matrices are then the COMPACT level-1 ones and operate on the
    (Ltot/te, te*W) view; see the polyphase note above)."""
    if te == 1:
        return _swt_ana_dots(xp, Dm, Dr, b, K, L)
    W = xp.shape[1]
    xq = xp.reshape(xp.shape[0] // te, te * W)
    lo, hi = _swt_ana_dots(xq, Dm, Dr, b, K, L // te)
    return lo.reshape(L, W), hi.reshape(L, W)


def _syn_dots_auto(lop, hip, Sm, Sr, b, K, L, te):
    """_swt_syn_dots through the polyphase reshape when te > 1."""
    if te == 1:
        return _swt_syn_dots(lop, hip, Sm, Sr, b, K, L)
    W = lop.shape[1]
    lq = lop.reshape(lop.shape[0] // te, te * W)
    hq = hip.reshape(hip.shape[0] // te, te * W)
    return _swt_syn_dots(lq, hq, Sm, Sr, b, K, L // te).reshape(L, W)


# ---------------------------------------------------------------------------
# Fused 2D analysis level
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_swt2d_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=False)
    bands = pk._pick_bands_swt(nr, nc, lp, rp, n_bufs=8)
    if bands is None:
        return None
    ib, hh = bands
    te = _poly_t(level, ib, nc, hlen=hlen, prec=prec)
    span = (hlen - 1) * (t // te)
    b = _pick_b(span, min(ib, nc) // te, row_mult=2, k_mult=1)
    if b < 1:
        return None

    Dm, K = swt_analysis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Dm]
    rems = []
    for L in (ib // te, nc // te):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(swt_analysis_matrix(flo, fhi, r,
                                            _mat_level(level, te))[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    n_mats = len(mats)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        top_ref, body_ref, bot_ref = refs[n_mats:n_mats + 3]
        a_ref, h_ref, v_ref, d_ref = refs[n_mats + 3:]
        Dr_row = ms[rems[0]] if rems[0] is not None else None
        Dr_col = ms[rems[1]] if rems[1] is not None else None

        rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
        lo_r, hi_r = _ana_dots_auto(rows, ms[0], Dr_row, b, K, ib, te)

        def cols(x):
            tp = pk._pad_lanes_T(x, lp, rp)
            l2, h2 = _ana_dots_auto(tp, ms[0], Dr_col, b, K, nc, te)
            return l2.T, h2.T

        a, v = cols(lo_r)
        h, d = cols(hi_r)
        a_ref[:, :] = a
        h_ref[:, :] = h
        v_ref[:, :] = v
        d_ref[:, :] = d

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    # numpy (NOT jnp) constants: the builder is lru_cached and may first
    # run inside a jit trace (see ops/mxu_dwt.py)
    mats_j = [np.asarray(m) for m in mats]

    def fused(x):
        return call(*mats_j, x, x, x)

    return fused


def swt2d_level_fused_mxu(x, fb, level):
    """One fused stationary analysis level on the MXU; None if
    uncovered."""
    if x.ndim not in (2, 3) or x.dtype != jnp.float32:
        return None
    nr, nc = x.shape[-2], x.shape[-1]
    lp, rp, _, _ = pk._swt_pads(fb.hlen, level, inverse=False)
    if max(lp, rp) > min(nr, nc):
        return None  # support exceeds image; jnp path wraps correctly
    f = _build_swt2d_mxu(nr, nc, pk._taps(fb.dec_lo), pk._taps(fb.dec_hi),
                         level, pk._interpret(), _prec())
    if f is None:
        return None
    if x.ndim == 3:
        return tuple(jax.vmap(f)(x))
    return tuple(f(x))


# ---------------------------------------------------------------------------
# Fused 2D synthesis level
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_iswt2d_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=True)
    bands = pk._pick_bands_swt(nr, nc, lp, rp, n_bufs=16)
    if bands is None:
        return None
    ib, hh = bands
    te = _poly_t(level, ib, nc, hlen=hlen, synthesis=True,
                 prec=prec)
    span = (hlen - 1) * (t // te)
    b = _pick_b(span, min(ib, nc) // te, row_mult=1, k_mult=2)
    if b < 1:
        return None

    Sm, K = swt_synthesis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Sm]
    rems = []
    for L in (ib // te, nc // te):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(swt_synthesis_matrix(flo, fhi, r,
                                             _mat_level(level, te))[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    n_mats = len(mats)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        blocks = refs[n_mats:n_mats + 12]
        out_ref = refs[n_mats + 12]
        Sr_row = ms[rems[0]] if rems[0] is not None else None
        Sr_col = ms[rems[1]] if rems[1] is not None else None

        ar = pk._gather_rows(*blocks[0:3], lp, rp)
        hr = pk._gather_rows(*blocks[3:6], lp, rp)
        vr = pk._gather_rows(*blocks[6:9], lp, rp)
        dr = pk._gather_rows(*blocks[9:12], lp, rp)

        t1 = _syn_dots_auto(ar, hr, ms[0], Sr_row, b, K, ib, te)
        t2 = _syn_dots_auto(vr, dr, ms[0], Sr_row, b, K, ib, te)

        lop = pk._pad_lanes_T(t1, lp, rp)
        hip = pk._pad_lanes_T(t2, lp, rp)
        out_ref[:, :] = _syn_dots_auto(lop, hip, ms[0], Sr_col, b, K,
                                       nc, te).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot] * 4,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp: see above

    def fused(a, h, v, d):
        return call(*mats_j, a, a, a, h, h, h, v, v, v, d, d, d)

    return fused


def iswt2d_level_fused_mxu(a, h, v, d, fb, level):
    """One fused stationary synthesis level on the MXU; None if
    uncovered."""
    if a.ndim not in (2, 3) or a.dtype != jnp.float32:
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    nr, nc = a.shape[-2], a.shape[-1]
    lp, rp, _, _ = pk._swt_pads(fb.hlen, level, inverse=True)
    if max(lp, rp) > min(nr, nc):
        return None
    f = _build_iswt2d_mxu(nr, nc, pk._taps(fb.rec_lo), pk._taps(fb.rec_hi),
                          level, pk._interpret(), _prec())
    if f is None:
        return None
    if a.ndim == 3:
        return jax.vmap(f)(a, h, v, d)
    return f(a, h, v, d)


# ---------------------------------------------------------------------------
# Fused batched-1D levels (lane-axis transform via transposed dots)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_swt1d_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=False)
    bands = pk._pick_bands_swt(nr, nc, 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    # NO polyphase on the lane-axis (transposed-plane) 1D geometry:
    # the same reshape class failed Mosaic compile for the folded long
    # kernels (round-5 probe, "MosaicError") and only forced-MXU mode
    # can reach it here; banded is round-4-proven.
    te = 1
    span = (hlen - 1) * t
    b = _pick_b(span, nc // te, row_mult=2, k_mult=1)
    if b < 1:
        return None
    Dm, K = swt_analysis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Dm]
    ncq = nc // te
    r = ncq - (ncq // b) * b
    if r:
        mats.append(swt_analysis_matrix(flo, fhi, r,
                                        _mat_level(level, te))[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    body = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        body_ref = refs[n_mats]
        lo_ref, hi_ref = refs[n_mats + 1:]
        Dr = ms[1] if n_mats > 1 else None
        tp = pk._pad_lanes_T(body_ref[:, :], lp, rp)
        lo, hi = _ana_dots_auto(tp, ms[0], Dr, b, K, nc, te)
        lo_ref[:, :] = lo.T
        hi_ref[:, :] = hi.T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp: see above
    return lambda x: tuple(call(*mats_j, x))


def swt1d_level_fused_mxu(x, fb, level):
    """One fused batched-1D stationary analysis level on the MXU; None
    if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    lp, rp, _, _ = pk._swt_pads(fb.hlen, level, inverse=False)
    if max(lp, rp) > x.shape[1]:
        return None
    f = _build_swt1d_mxu(x.shape[0], x.shape[1], pk._taps(fb.dec_lo),
                         pk._taps(fb.dec_hi), level, pk._interpret(), _prec())
    if f is None:
        return None
    return f(x)


@functools.lru_cache(maxsize=512)
def _build_iswt1d_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=True)
    bands = pk._pick_bands_swt(nr, nc, 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    te = 1  # no polyphase on the transposed 1D geometry (see analysis)
    span = (hlen - 1) * t
    b = _pick_b(span, nc // te, row_mult=1, k_mult=2)
    if b < 1:
        return None
    Sm, K = swt_synthesis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Sm]
    ncq = nc // te
    r = ncq - (ncq // b) * b
    if r:
        mats.append(swt_synthesis_matrix(flo, fhi, r,
                                         _mat_level(level, te))[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        a_ref, dd_ref, out_ref = refs[n_mats:]
        Sr = ms[1] if n_mats > 1 else None
        lop = pk._pad_lanes_T(a_ref[:, :], lp, rp)
        hip = pk._pad_lanes_T(dd_ref[:, :], lp, rp)
        out_ref[:, :] = _syn_dots_auto(lop, hip, ms[0], Sr, b, K, nc,
                                       te).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp: see above
    return lambda a, d: call(*mats_j, a, d)


def iswt1d_level_fused_mxu(a, d, fb, level):
    """One fused batched-1D stationary synthesis level on the MXU; None
    if uncovered."""
    if a.ndim != 2 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    lp, rp, _, _ = pk._swt_pads(fb.hlen, level, inverse=True)
    if max(lp, rp) > a.shape[1]:
        return None
    f = _build_iswt1d_mxu(a.shape[0], a.shape[1], pk._taps(fb.rec_lo),
                          pk._taps(fb.rec_hi), level, pk._interpret(), _prec())
    if f is None:
        return None
    return f(a, d)


# ---------------------------------------------------------------------------
# Sharded a-trous level kernels (ppermute edge halos; parallel/spatial.py)
# — the MXU twins of pallas_dwt.build_swt2d_sharded/_iswt2d_sharded.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def build_swt2d_sharded_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    """(fused_fn, halo_rows) for one sharded a-trous analysis level on
    the MXU, or None.  fused_fn(x, ext_top, ext_bot) -> (a, h, v, d)."""
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=False)
    if max(lp, rp) > nc:
        return None  # column (local) axis wrap would need multi-wrap
    bands = pk._pick_bands_swt(nr, nc, lp, rp, n_bufs=8)
    if bands is None:
        return None
    ib, hh = bands
    te = _poly_t(level, ib, nc, hlen=hlen, prec=prec)
    span = (hlen - 1) * (t // te)
    b = _pick_b(span, min(ib, nc) // te, row_mult=2, k_mult=1)
    if b < 1:
        return None

    Dm, K = swt_analysis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Dm]
    rems = []
    for L in (ib // te, nc // te):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(swt_analysis_matrix(flo, fhi, r,
                                            _mat_level(level, te))[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    n_mats = len(mats)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        top_ref, body_ref, bot_ref, et_ref, eb_ref = \
            refs[n_mats:n_mats + 5]
        a_ref, h_ref, v_ref, d_ref = refs[n_mats + 5:]
        Dr_row = ms[rems[0]] if rems[0] is not None else None
        Dr_col = ms[rems[1]] if rems[1] is not None else None

        topb, botb = pk._edge_override(top_ref, bot_ref, et_ref, eb_ref)
        rows = pk._gather_rows(topb, body_ref, botb, lp, rp)
        lo_r, hi_r = _ana_dots_auto(rows, ms[0], Dr_row, b, K, ib, te)

        def cols(x):
            tp = pk._pad_lanes_T(x, lp, rp)
            l2, h2 = _ana_dots_auto(tp, ms[0], Dr_col, b, K, nc, te)
            return l2.T, h2.T

        a, v = cols(lo_r)
        h, d = cols(hi_r)
        a_ref[:, :] = a
        h_ref[:, :] = h
        v_ref[:, :] = v
        d_ref[:, :] = d

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot, ext, ext],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp

    def fused(x, ext_top, ext_bot):
        return call(*mats_j, x, x, x, ext_top, ext_bot)

    return fused, hh


@functools.lru_cache(maxsize=512)
def build_iswt2d_sharded_mxu(nr, nc, flo, fhi, level, interpret, prec="highest"):
    """(fused_fn, halo_rows) for one sharded a-trous synthesis level on
    the MXU, or None."""
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=True)
    if max(lp, rp) > nc:
        return None
    bands = pk._pick_bands_swt(nr, nc, lp, rp, n_bufs=16)
    if bands is None:
        return None
    ib, hh = bands
    te = _poly_t(level, ib, nc, hlen=hlen, synthesis=True,
                 prec=prec)
    span = (hlen - 1) * (t // te)
    b = _pick_b(span, min(ib, nc) // te, row_mult=1, k_mult=2)
    if b < 1:
        return None

    Sm, K = swt_synthesis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Sm]
    rems = []
    for L in (ib // te, nc // te):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(swt_synthesis_matrix(flo, fhi, r,
                                             _mat_level(level, te))[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    n_mats = len(mats)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        blocks = refs[n_mats:n_mats + 12]
        exts = refs[n_mats + 12:n_mats + 20]
        out_ref = refs[n_mats + 20]
        Sr_row = ms[rems[0]] if rems[0] is not None else None
        Sr_col = ms[rems[1]] if rems[1] is not None else None

        planes = []
        for j in range(4):
            tpb, bd, bo = blocks[3 * j: 3 * j + 3]
            et, eb = exts[2 * j: 2 * j + 2]
            tb, bb = pk._edge_override(tpb, bo, et, eb)
            planes.append(pk._gather_rows(tb, bd, bb, lp, rp))
        ar, hr, vr, dr = planes

        t1 = _syn_dots_auto(ar, hr, ms[0], Sr_row, b, K, ib, te)
        t2 = _syn_dots_auto(vr, dr, ms[0], Sr_row, b, K, ib, te)

        lop = pk._pad_lanes_T(t1, lp, rp)
        hip = pk._pad_lanes_T(t2, lp, rp)
        out_ref[:, :] = _syn_dots_auto(lop, hip, ms[0], Sr_col, b, K,
                                       nc, te).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=([d_spec] * n_mats + [top, body, bot] * 4
                  + [ext] * 8),
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp

    def fused(a, h, v, d, halos):
        a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b = halos
        return call(*mats_j, a, a, a, h, h, h, v, v, v, d, d, d,
                    a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b)

    return fused, hh


# ---------------------------------------------------------------------------
# Folded long-1D a-trous kernels (in-kernel inter-row halos via
# pallas_dwt._fold_pad).  No per-tap temporaries, so wide filters that
# the VPU long builders decline (VMEM blowup) are covered.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_swt1d_long_mxu(nr, c, level, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=False)
    if max(lp, rp) > c:
        return None  # multi-row pads: jnp fold path
    bands = pk._pick_bands(nr, c, 1, 1, n_bufs=8)
    if bands is None:
        return None
    ib, hh = bands
    # NO polyphase here: the reshape of the transposed FOLDED plane
    # fails Mosaic compile on the chip (round-5 probe: sym8/db10 L3
    # long-SWT MosaicError); the banded form was round-4-proven.
    te = 1
    span = (hlen - 1) * t
    b = _pick_b(span, c // te, row_mult=2, k_mult=1)
    if b < 1:
        return None
    Dm, K = swt_analysis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Dm]
    cq = c // te
    r = cq - (cq // b) * b
    if r:
        mats.append(swt_analysis_matrix(flo, fhi, r,
                                        _mat_level(level, te))[0])
    n_mats = len(mats)

    top, body, bot = pk._halo_specs(ib, hh, nr, c)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        top_ref, body_ref, bot_ref = refs[n_mats:n_mats + 3]
        lo_ref, hi_ref = refs[n_mats + 3:]
        Dr = ms[1] if n_mats > 1 else None
        tp = pk._fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
        lo, hi = _ana_dots_auto(tp, ms[0], Dr, b, K, c, te)
        lo_ref[:, :] = lo.T
        hi_ref[:, :] = hi.T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp
    return lambda x2: tuple(call(*mats_j, x2, x2, x2))


def swt1d_long_fused_mxu(x, fb, level, rc):
    """One a-trous analysis level of a long 1D signal via banded MXU
    dots on the folded plane; None if uncovered."""
    if x.ndim != 1 or x.dtype != jnp.float32:
        return None
    r, c = rc
    if (1 << (level - 1)) % c == 0:
        return None  # row-roll fast path handles this better
    f = _build_swt1d_long_mxu(r, c, level, pk._taps(fb.dec_lo),
                              pk._taps(fb.dec_hi), pk._interpret(), _prec())
    if f is None:
        return None
    lo, hi = f(x.reshape(r, c))
    return lo.reshape(-1), hi.reshape(-1)


@functools.lru_cache(maxsize=512)
def _build_iswt1d_long_mxu(nr, c, level, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    t = 1 << (level - 1)
    lp, rp, _, _ = pk._swt_pads(hlen, level, inverse=True)
    if max(lp, rp) > c:
        return None
    bands = pk._pick_bands(nr, c, 1, 1, n_bufs=10)
    if bands is None:
        return None
    ib, hh = bands
    te = 1  # no polyphase on folded planes (MosaicError; see analysis)
    span = (hlen - 1) * t
    b = _pick_b(span, c // te, row_mult=1, k_mult=2)
    if b < 1:
        return None
    Sm, K = swt_synthesis_matrix(flo, fhi, b, _mat_level(level, te))
    mats = [Sm]
    cq = c // te
    r = cq - (cq // b) * b
    if r:
        mats.append(swt_synthesis_matrix(flo, fhi, r,
                                         _mat_level(level, te))[0])
    n_mats = len(mats)

    top, body, bot = pk._halo_specs(ib, hh, nr, c)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        (a_top, a_body, a_bot, d_top, d_body, d_bot) = \
            refs[n_mats:n_mats + 6]
        out_ref = refs[n_mats + 6]
        Sr = ms[1] if n_mats > 1 else None
        ap = pk._fold_pad(a_top, a_body, a_bot, lp, rp).T
        dp = pk._fold_pad(d_top, d_body, d_bot, lp, rp).T
        out_ref[:, :] = _syn_dots_auto(ap, dp, ms[0], Sr, b, K, c, te).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot] * 2,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp
    return lambda a2, d2: call(*mats_j, a2, a2, a2, d2, d2, d2)


def iswt1d_long_fused_mxu(a, d, fb, level, rc):
    """One a-trous synthesis level of a long 1D pair via banded MXU
    dots; None if uncovered."""
    if a.ndim != 1 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    r, c = rc
    if (1 << (level - 1)) % c == 0:
        return None  # row-roll fast path handles this better
    f = _build_iswt1d_long_mxu(r, c, level, pk._taps(fb.rec_lo),
                               pk._taps(fb.rec_hi), pk._interpret(), _prec())
    if f is None:
        return None
    return f(a.reshape(r, c), d.reshape(r, c)).reshape(-1)
