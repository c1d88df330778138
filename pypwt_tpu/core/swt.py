"""Stationary (undecimated) wavelet transform, separable, multi-level.

Equivalent of the reference's a-trous SWT drivers
(w_forward_swt_separable, separable.cu:496-515; w_inverse_swt_separable,
separable.cu:629-649; 1D variants :519-537, :653-672).  All subbands keep
the input size; level-ℓ filters are dilated by 2^(ℓ-1); the inverse rescales
by 1/2 per axis pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import conv
from . import dwt as _dwt
from .dwt import _pallas_enabled


def _pk():
    from ..ops import pallas_dwt
    return pallas_dwt


def _mx():
    from ..ops import mxu_swt
    return mxu_swt


# SWT routing crossover, measured on TPU v5e (1024^2 per-level kernels,
# chained timing; full table in doc/performance.md round-4 section and
# tools/proto_mxu_swt.py artifact).  Unlike the decimated DWT — where the
# banded MXU dots win from hlen 6 — the undecimated a-trous kernels keep
# the VPU competitive much longer because per-level traffic is constant:
#   * hlen < 16: VPU wins at EVERY level (db4 L2: 46.5 us VPU vs
#     61.1 us MXU; db2: 29.9 vs 61.2).
#   * hlen >= 16: MXU wins while the dilated support
#     K = (hlen-1)*2^(level-1)+1 stays under the band cliff — cost
#     jumps ~2.2x once K crosses ~100 (sym8 L4 K=121: 139.1 us MXU vs
#     40.7 VPU; db10 L3 K=77: 64.1 MXU vs 83.4 VPU).  Synthesis re-bands
#     two operands, so its cliff comes sooner (sym8 L3 K=61: 88.4 MXU vs
#     58.7 VPU; db10 L2 K=39: 63.5 MXU vs 82.0 VPU).
#   * bf16 MXU mode is ~27 us FLAT for every hlen and level measured
#     (single-pass dots halve the band traffic; no cliff up to L4) —
#     route every eligible bank to the MXU there.
_SWT_MXU_MIN_HLEN = 16
_SWT_SUPPORT_CLIFF_ANA = 96
_SWT_SUPPORT_CLIFF_SYN = 40
# Long-1D folded a-trous, re-measured round 5 (4Mi/L3 roundtrips,
# tools/proto_longfold_r5.py): with >= 128-row foldings and the
# scratch-ref variant the VPU fold wins at EVERY width through db10
# (hlen 20: 727.5 us vs 1065.2 MXU; sym8 612.9 vs 1054.1), so the MXU
# only serves untested wider banks (hlen >= 22, where the scratch
# builders decline rather than risk the VMEM blowup).
_SWT_LONG_MXU_MIN_HLEN = 22


def _mxu_swt_long_wanted(fb):
    if _dwt._KERNEL_MODE == "mxu":
        return True
    return (_dwt._KERNEL_MODE == "auto"
            and fb.hlen >= _SWT_LONG_MXU_MIN_HLEN)


def _mxu_swt_wanted(fb, level, synthesis=False):
    """Level-aware MXU routing for stationary levels (grounded on-chip,
    VERDICT r3 next #2; replaces the DWT-derived hlen>=6 rule)."""
    if _dwt._KERNEL_MODE == "mxu":
        return True
    if _dwt._KERNEL_MODE != "auto" or fb.hlen < 6:
        return False
    if _dwt.mxu_precision() == "bf16":
        return True
    if fb.hlen < _SWT_MXU_MIN_HLEN:
        return False
    support = (fb.hlen - 1) * (1 << (level - 1)) + 1
    return support <= (_SWT_SUPPORT_CLIFF_SYN if synthesis
                       else _SWT_SUPPORT_CLIFF_ANA)


def swt1d_level(x, fb, level):
    if x.ndim == 1:
        rc = conv.long1d_shape(x.shape[0])
        if rc is not None:
            if _pallas_enabled():
                if _mxu_swt_long_wanted(fb):
                    r = _mx().swt1d_long_fused_mxu(x, fb, level, rc)
                    if r is not None:
                        return r
                r = _pk().swt1d_long_fused(x, fb, level, rc)
                if r is not None:
                    return r
            return conv.swt_analysis_long1d(x, fb.dec_lo, fb.dec_hi,
                                            level, rc)
    if _pallas_enabled() and x.ndim == 2:
        if _mxu_swt_wanted(fb, level):
            r = _mx().swt1d_level_fused_mxu(x, fb, level)
            if r is not None:
                return r
        r = _pk().swt1d_level_fused(x, fb, level)
        if r is not None:
            return r
    return conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level)


def iswt1d_level(a, d, fb, level):
    if a.ndim == 1:
        rc = conv.long1d_shape(a.shape[0])
        if rc is not None:
            if _pallas_enabled():
                if _mxu_swt_long_wanted(fb):
                    r = _mx().iswt1d_long_fused_mxu(a, d, fb, level, rc)
                    if r is not None:
                        return r
                r = _pk().iswt1d_long_fused(a, d, fb, level, rc)
                if r is not None:
                    return r
            return conv.swt_synthesis_long1d(a, d, fb.rec_lo, fb.rec_hi,
                                             level, rc)
    if _pallas_enabled() and a.ndim == 2:
        if _mxu_swt_wanted(fb, level, synthesis=True):
            r = _mx().iswt1d_level_fused_mxu(a, d, fb, level)
            if r is not None:
                return r
        r = _pk().iswt1d_level_fused(a, d, fb, level)
        if r is not None:
            return r
    return conv.swt_synthesis_last(a, d, fb.rec_lo, fb.rec_hi, level)


def swt2d_level(x, fb, level):
    """One stationary 2D analysis level -> (a, h, v, d).

    On TPU, covered shapes run as one fused Pallas kernel (banded MXU
    dots for wide filters, VPU tap loops otherwise)."""
    if _pallas_enabled():
        if _mxu_swt_wanted(fb, level):
            r = _mx().swt2d_level_fused_mxu(x, fb, level)
            if r is not None:
                return r
        r = _pk().swt2d_level_fused(x, fb, level)
        if r is not None:
            return r
    t1, t2 = conv.swt_analysis_last(x, fb.dec_lo, fb.dec_hi, level)
    t1 = jnp.swapaxes(t1, -1, -2)
    t2 = jnp.swapaxes(t2, -1, -2)
    a, h = conv.swt_analysis_last(t1, fb.dec_lo, fb.dec_hi, level)
    v, d = conv.swt_analysis_last(t2, fb.dec_lo, fb.dec_hi, level)
    return (jnp.swapaxes(a, -1, -2), jnp.swapaxes(h, -1, -2),
            jnp.swapaxes(v, -1, -2), jnp.swapaxes(d, -1, -2))


def iswt2d_level(a, h, v, d, fb, level):
    """One stationary 2D synthesis level (column pass then row pass)."""
    if _pallas_enabled():
        if _mxu_swt_wanted(fb, level, synthesis=True):
            r = _mx().iswt2d_level_fused_mxu(a, h, v, d, fb, level)
            if r is not None:
                return r
        r = _pk().iswt2d_level_fused(a, h, v, d, fb, level)
        if r is not None:
            return r
    at = jnp.swapaxes(a, -1, -2)
    ht = jnp.swapaxes(h, -1, -2)
    vt = jnp.swapaxes(v, -1, -2)
    dt = jnp.swapaxes(d, -1, -2)
    t1 = conv.swt_synthesis_last(at, ht, fb.rec_lo, fb.rec_hi, level)
    t2 = conv.swt_synthesis_last(vt, dt, fb.rec_lo, fb.rec_hi, level)
    t1 = jnp.swapaxes(t1, -1, -2)
    t2 = jnp.swapaxes(t2, -1, -2)
    return conv.swt_synthesis_last(t1, t2, fb.rec_lo, fb.rec_hi, level)


def swt2d(image, fb, levels):
    a = image
    details = []
    for lev in range(1, levels + 1):
        a, h, v, d = swt2d_level(a, fb, lev)
        details.append((h, v, d))
    return [a] + details


def iswt2d(coeffs, fb):
    levels = len(coeffs) - 1
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        h, v, d = coeffs[lev]
        a = iswt2d_level(a, h, v, d, fb, lev)
    return a


def swt1d(x, fb, levels):
    a = x
    details = []
    for lev in range(1, levels + 1):
        a, d = swt1d_level(a, fb, lev)
        details.append(d)
    return [a] + details


def iswt1d(coeffs, fb):
    levels = len(coeffs) - 1
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        a = iswt1d_level(a, coeffs[lev], fb, lev)
    return a
