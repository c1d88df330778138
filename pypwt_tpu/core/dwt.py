"""Multi-level separable DWT (1D, batched-1D, 2D), forward and inverse.

Functional equivalents of the reference's host-side level loops
(w_forward_separable, separable.cu:179-209; w_inverse_separable,
separable.cu:332-364; 1D variants :214-236, :368-395).  The coefficient
pyramid is a PyTree list — 2D: ``[A, (H1, V1, D1), ..., (Hn, Vn, Dn)]``,
1D: ``[A, D1, ..., Dn]`` — replacing the reference's manually managed
device-buffer array (common.cu:400-445).

Axis convention (matches the reference): the last axis is the "column" axis
filtered by pass 1; the second-to-last axis is filtered by pass 2.  1D
transforms filter only the last axis, so a 2D input gives the reference's
batched-1D mode (pypwt.pyx:146-151).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from . import conv
from .shapes import div2

# Kernel selection: "auto" runs the fused Pallas level kernels on TPU for
# shapes they cover (falling back to jnp per-config); "jnp"/"pallas"/"mxu"
# force a path.  Measured on TPU v5 (2048^2, db2, 3 levels, chained
# timing): pallas round trip 209 us vs jnp 379 us — the fused kernels win
# once the bands are wide enough for full 128-lane transposed tiles
# (requires the raised Mosaic VMEM limit, see ops/pallas_dwt.py).
#
# Wide filters (hlen >= _MXU_MIN_HLEN) route to the banded MXU-dot
# kernels (ops/mxu_dwt.py), whose cost is tap-count-independent: measured
# level-0 analysis at 2048^2 is ~104 us for db2 AND sym8, vs 103/274 us
# on the VPU tap loops.
_KERNEL_MODE = os.environ.get("PYPWT_KERNELS", "auto")
# Measured level-0 pairs at 2048^2 (chained): analysis is faster on the
# VPU tap loops for short filters (db2 VPU-ana+MXU-syn 136 us vs pure
# VPU 143 / pure MXU 148), while synthesis is faster on the banded MXU
# dots from hlen 4 up; wide filters (hlen >= 6) take MXU on both passes
# (sym8 VPU would be 2.65x db2 for equal traffic).  Haar keeps the VPU
# butterfly everywhere.
_MXU_MIN_HLEN = 6


def set_kernels(mode: str):
    """Select the compute path: 'auto', 'jnp', 'pallas' (VPU tap loops),
    or 'mxu' (banded MXU dots)."""
    global _KERNEL_MODE
    if mode not in ("auto", "jnp", "pallas", "mxu"):
        raise ValueError("kernel mode must be auto|jnp|pallas|mxu")
    _KERNEL_MODE = mode


# MXU dot precision.  "highest" (default) is the six-pass ~fp32 scheme
# that meets the reference's 3e-4 * 2^level ABSOLUTE envelope on 0..255
# data.  "bf16" runs single-pass bf16 MXU dots — ~6x the MXU rate for
# wide filters — for throughput-first workloads that tolerate ~1% RMS
# relative error (measured ~2.5 abs on 255-scale data at 2048^2).  Read
# at trace time like _KERNEL_MODE; plan caches key on it.
_MXU_PRECISION = os.environ.get("PYPWT_MXU_PRECISION", "highest")


def set_mxu_precision(prec: str):
    """Select MXU dot precision: 'highest' (fp32-exact six-pass,
    default) or 'bf16' (single-pass, ~1% RMS / <=3.5% worst-pixel
    relative error measured on-device, fastest)."""
    global _MXU_PRECISION
    if prec not in ("highest", "bf16"):
        raise ValueError("mxu precision must be highest|bf16")
    _MXU_PRECISION = prec


def mxu_precision() -> str:
    return _MXU_PRECISION


def _pallas_enabled():
    if _KERNEL_MODE == "jnp":
        return False
    if _KERNEL_MODE in ("pallas", "mxu"):
        return True
    import jax
    return jax.default_backend() == "tpu"


# Long-1D folded-plane routing, re-measured round 5 on TPU v5e (4Mi
# L5 roundtrips, chained; tools/proto_longfold_r5.py, doc/performance.md
# round-5 table).  With >= 128-row foldings, the 52 MB band budget and
# the scratch-ref fold variant, the round-4 hlen >= 12 cliff is GONE
# and the VPU fold beats the banded MXU at every width it builds
# (db2 236.0 vs 688.4; sym8 342.4 vs 687.8).  The scratch DWT kernels
# blow VMEM from hlen ~18-20 (db10 JaxRuntimeError) and the builders
# decline there, so the MXU takes over only at hlen >= 18.
_LONG1D_MXU_MIN_HLEN = 18


def _mxu_long_wanted(fb):
    if _KERNEL_MODE == "mxu":
        return True
    return _KERNEL_MODE == "auto" and fb.hlen >= _LONG1D_MXU_MIN_HLEN


def _mxu_wanted(fb):
    """MXU routing: wide filters only.  An hlen-4 MXU synthesis wins in
    an isolated level-0 pair (db2 136 vs 143 us at 2048^2) but LOSES ~7us
    inside the full 3-level roundtrip (203 vs 196 us measured both with a
    size gate and without) — scheduling interactions eat the gain, so the
    routing stays uniform per filter width."""
    if _KERNEL_MODE == "mxu":
        return True
    return _KERNEL_MODE == "auto" and fb.hlen >= _MXU_MIN_HLEN


def _pk():
    from ..ops import pallas_dwt
    return pallas_dwt


def _mx():
    from ..ops import mxu_dwt
    return mxu_dwt


def dwt1d(x, fb):
    """One analysis level along the last axis -> (a, d).

    Batched (2D) float32 inputs run as a fused Pallas kernel on TPU;
    single LONG signals are folded into rows with inter-row halos (a
    (1, n) layout is pathologically slow on TPU)."""
    if x.ndim == 1:
        rc = conv.long1d_shape(x.shape[0])
        if rc is not None and fb.hlen <= rc[1] // 2:
            if _pallas_enabled():
                if _mxu_long_wanted(fb):
                    r = _mx().dwt1d_long_fused_mxu(x, fb, rc)
                    if r is not None:
                        return r
                r = _pk().dwt1d_long_fused(x, fb, rc)
                if r is not None:
                    return r
            return conv.analysis_long1d(x, fb.dec_lo, fb.dec_hi, rc)
    if _pallas_enabled() and x.ndim == 2:
        if _mxu_wanted(fb):
            r = _mx().dwt1d_fused_mxu(x, fb)
            if r is not None:
                return r
        r = _pk().dwt1d_fused(x, fb)
        if r is not None:
            return r
    return conv.analysis_last(x, fb.dec_lo, fb.dec_hi)


def idwt1d(a, d, fb, n_out):
    """One synthesis level along the last axis."""
    if a.ndim == 1 and n_out == 2 * a.shape[0]:
        rc = conv.long1d_shape(a.shape[0])
        if rc is not None and fb.hlen <= rc[1] // 2:
            if _pallas_enabled():
                if _mxu_long_wanted(fb):
                    r = _mx().idwt1d_long_fused_mxu(a, d, fb, n_out, rc)
                    if r is not None:
                        return r
                r = _pk().idwt1d_long_fused(a, d, fb, n_out, rc)
                if r is not None:
                    return r
            return conv.synthesis_long1d(a, d, fb.rec_lo, fb.rec_hi,
                                         n_out, rc)
    if _pallas_enabled() and a.ndim == 2:
        if _mxu_wanted(fb):
            r = _mx().idwt1d_fused_mxu(a, d, fb, n_out)
            if r is not None:
                return r
        r = _pk().idwt1d_fused(a, d, fb, n_out)
        if r is not None:
            return r
    return conv.synthesis_last(a, d, fb.rec_lo, fb.rec_hi, n_out)


def dwt2d(x, fb):
    """One separable 2D analysis level -> (a, h, v, d).

    Pass 1 filters the last (column) axis, pass 2 the row axis, exactly the
    reference's kernel pair (separable.cu:91-176).  On TPU, covered shapes
    run as one fused Pallas kernel (ops/pallas_dwt.py).
    """
    if _pallas_enabled():
        if _mxu_wanted(fb):
            r = _mx().dwt2d_fused_mxu(x, fb)
            if r is not None:
                return r
        r = _pk().dwt2d_fused(x, fb)
        if r is not None:
            return r
    t1, t2 = conv.analysis_last(x, fb.dec_lo, fb.dec_hi)
    t1 = jnp.swapaxes(t1, -1, -2)
    t2 = jnp.swapaxes(t2, -1, -2)
    a, h = conv.analysis_last(t1, fb.dec_lo, fb.dec_hi)
    v, d = conv.analysis_last(t2, fb.dec_lo, fb.dec_hi)
    return (jnp.swapaxes(a, -1, -2), jnp.swapaxes(h, -1, -2),
            jnp.swapaxes(v, -1, -2), jnp.swapaxes(d, -1, -2))


def idwt2d(a, h, v, d, fb, out_shape):
    """One separable 2D synthesis level -> image of ``out_shape``."""
    if _pallas_enabled():
        if _mxu_wanted(fb):
            r = _mx().idwt2d_fused_mxu(a, h, v, d, fb, out_shape)
            if r is not None:
                return r
        r = _pk().idwt2d_fused(a, h, v, d, fb, out_shape)
        if r is not None:
            return r
    nr, nc = out_shape[-2], out_shape[-1]
    at = jnp.swapaxes(a, -1, -2)
    ht = jnp.swapaxes(h, -1, -2)
    vt = jnp.swapaxes(v, -1, -2)
    dt = jnp.swapaxes(d, -1, -2)
    t1 = conv.synthesis_last(at, ht, fb.rec_lo, fb.rec_hi, nr)
    t2 = conv.synthesis_last(vt, dt, fb.rec_lo, fb.rec_hi, nr)
    t1 = jnp.swapaxes(t1, -1, -2)
    t2 = jnp.swapaxes(t2, -1, -2)
    return conv.synthesis_last(t1, t2, fb.rec_lo, fb.rec_hi, nc)


# Tail-level fusion: keep level 0 as the optimal standalone kernel and
# run levels 2..L (inputs <= half size) as ONE fused-pyramid kernel —
# distinct from ops/fused_pyramid's all-levels mode, which lost to
# pipelining at level 0 (doc/performance.md).  Off until measured faster
# on hardware; enable with PYPWT_TAIL_FUSE=1.
_TAIL_FUSE = os.environ.get("PYPWT_TAIL_FUSE", "0") == "1"


def set_tail_fuse(on: bool):
    global _TAIL_FUSE
    _TAIL_FUSE = bool(on)


def wavedec2_tailfused(image, fb, levels: int):
    """Level 0 standalone + levels 2..L in one pyramid kernel; None if
    uncovered."""
    if levels < 3 or not _pallas_enabled():
        return None
    from ..ops import fused_pyramid as fp
    lvl0 = dwt2d(image, fb)
    a0, h0, v0, d0 = lvl0
    tail = fp.wavedec2_pyramid(a0, fb, levels - 1)
    if tail is None:
        return None
    return [tail[0], (h0, v0, d0)] + tail[1:]


def waverec2_tailfused(coeffs, fb, shape):
    """Inverse of ``wavedec2_tailfused``: levels L..2 in one pyramid
    kernel, level 0 standalone; None if uncovered."""
    levels = len(coeffs) - 1
    if levels < 3 or not _pallas_enabled():
        return None
    from ..ops import fused_pyramid as fp
    h0, v0, d0 = coeffs[1]
    a0_shape = coeffs[1][0].shape[-2:]
    a1 = fp.waverec2_pyramid([coeffs[0]] + list(coeffs[2:]), fb,
                             a0_shape)
    if a1 is None:
        return None
    return idwt2d(a1, h0, v0, d0, fb, shape)


def wavedec2(image, fb, levels: int):
    """Multi-level separable 2D forward transform -> pyramid list."""
    if _TAIL_FUSE:
        r = wavedec2_tailfused(image, fb, levels)
        if r is not None:
            return r
    a = image
    details = []
    for _ in range(levels):
        a, h, v, d = dwt2d(a, fb)
        details.append((h, v, d))
    return [a] + details


def waverec2(coeffs, fb, shape):
    """Multi-level separable 2D inverse.  ``shape`` is the original image
    shape; per-level output sizes follow the div2 chain (wt.cu:332-342)."""
    if _TAIL_FUSE:
        r = waverec2_tailfused(coeffs, fb, shape)
        if r is not None:
            return r
    levels = len(coeffs) - 1
    sizes = [tuple(shape[-2:])]
    for _ in range(levels):
        sizes.append((div2(sizes[-1][0]), div2(sizes[-1][1])))
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        h, v, d = coeffs[lev]
        a = idwt2d(a, h, v, d, fb, sizes[lev - 1])
    return a


def wavedec1(x, fb, levels: int):
    """Multi-level (batched) 1D forward transform along the last axis."""
    a = x
    details = []
    for _ in range(levels):
        a, d = dwt1d(a, fb)
        details.append(d)
    return [a] + details


def waverec1(coeffs, fb, n: int):
    """Multi-level (batched) 1D inverse along the last axis."""
    levels = len(coeffs) - 1
    sizes = [n]
    for _ in range(levels):
        sizes.append(div2(sizes[-1]))
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        a = idwt1d(a, coeffs[lev], fb, sizes[lev - 1])
    return a
