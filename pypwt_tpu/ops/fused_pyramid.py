"""Whole-pyramid fused DWT kernels: ALL levels in ONE Pallas call.

The per-level kernels (ops/pallas_dwt.py) already fuse both separable
passes of one level, but a 3-level roundtrip still runs 6 kernels and
moves ~84 MB of HBM traffic at 2048^2 (each level re-reads its input and
re-writes its output).  Here the entire analysis pyramid is ONE grid
kernel and the entire synthesis pyramid another: a band of image rows is
read once, every level is computed in VMEM using the overlapped-tile
trick (each band recomputes a small margin of rows so deeper levels
never need neighbours' outputs), and the subbands of all levels are
written once — 66 MB of traffic and 2 launches instead of 6.

Margin algebra (rows, per side, symmetric because hlen is even so the
analysis pads are lp = rp = hlen//2 - 1):

  analysis   m_L = 0;  m_l = 2*m_{l+1} + (hlen//2 - 1)
  synthesis  n_0 = 0;  n_{l+1} = ceil_even(n_l)/2 + hlen//2 + 1

For db2 at 3 levels the band margin is 7 input rows (~1.4% recompute at
ib=512); for sym8 it is 49.  The reference has no analog — its CUDA
kernels are strictly per-level (pdwt/src/separable.cu:91-176) with a
full HBM round-trip between levels; this fusion is only natural on a
TPU, where VMEM is large enough to hold a whole band pyramid.

Correctness is differential: tests/test_pyramid.py checks these kernels
(interpret mode) against the per-level jnp path to 1e-6.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import conv
from . import pallas_dwt as pk

_VMEM_LIMIT = pk._VMEM_LIMIT
_VMEM_BUDGET = pk._VMEM_BUDGET


def _ceil_even(x):
    return x + (x & 1)


def _ana_margins(hlen, levels):
    """m[l] = extra input rows (per side) of level l needed by one band."""
    p = hlen // 2 - 1
    m = [0] * (levels + 1)
    for l in range(levels - 1, -1, -1):
        m[l] = 2 * m[l + 1] + p
    return m


def _syn_margins(hlen, levels):
    """n[l] = extra coefficient rows (per side) at level l; n[0] is the
    image margin (0).  Margins are kept even so the polyphase output
    phase stays aligned with the global row parity."""
    h2 = hlen // 2
    n = [0] * (levels + 1)
    for l in range(levels):
        n[l + 1] = _ceil_even(_ceil_even(n[l]) // 2 + h2 + 1)
    return n


def _pick_band(nr, nc, halo, n_bufs, max_body=512):
    """(ib, hh) with hh covering the multi-level halo (may exceed 32)."""
    hh = None
    for cand in (8, 16, 32, 64, 128):
        if cand >= max(halo, 1) and nr % cand == 0:
            hh = cand
            break
    out = None
    if hh is not None:
        for ib in (512, 256, 128, 64):
            if ib > max_body or nr % ib or ib % hh:
                continue
            if (ib + 2 * hh) * nc * 4 * n_bufs <= _VMEM_BUDGET:
                out = (ib, hh)
                break
    pk.BAND_CHOICES[("pyr", nr, nc, halo, n_bufs, max_body)] = out
    return out


# ---------------------------------------------------------------------------
# Analysis: one kernel, all levels
# ---------------------------------------------------------------------------

def _wavedec2_kernel(flo, fhi, levels, ib, margins, nc, refs):
    """refs = [top, body, bot] + outputs [h1,v1,d1, h2,v2,d2, ..., aL]."""
    hlen = len(flo)
    lp = rp = hlen // 2 - 1
    top_ref, body_ref, bot_ref = refs[:3]
    outs = refs[3:]
    hh = top_ref.shape[0]
    m0 = 2 * margins[1] + lp

    parts = []
    if m0:
        parts.append(top_ref[hh - m0:, :])
    parts.append(body_ref[:, :])
    if m0:
        parts.append(bot_ref[:m0, :])
    cur = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    for l in range(levels):
        own = ib >> (l + 1)
        mo = margins[l + 1]
        n_out = own + 2 * mo
        # row pass: cur already carries exactly the pads + margin rows
        lo_r, hi_r = pk._analysis_sub(cur, flo, fhi, n_out)
        # column pass: full axis present -> periodic pads
        lpc, rpc = conv.analysis_pads(hlen)
        a, v = pk._analysis_cols(lo_r, flo, fhi, lpc, rpc)
        h, d = pk._analysis_cols(hi_r, flo, fhi, lpc, rpc)
        o_h, o_v, o_d = outs[3 * l: 3 * l + 3]
        o_h[:, :] = h[mo: mo + own, :]
        o_v[:, :] = v[mo: mo + own, :]
        o_d[:, :] = d[mo: mo + own, :]
        if l == levels - 1:
            outs[-1][:, :] = a[mo: mo + own, :]
        else:
            # next level input: needs margin 2*m_{l+2} + lp of a-rows;
            # a has margin mo = m_{l+1} = 2*m_{l+2} + lp exactly
            cur = a


@functools.lru_cache(maxsize=256)
def _build_wavedec2(nr, nc, levels, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2 or levels < 2:
        return None
    if nr % (1 << levels) or nc % (1 << levels):
        return None
    margins = _ana_margins(hlen, levels)
    m0 = margins[0]
    picked = _pick_band(nr, nc, m0, n_bufs=7 + levels)
    if picked is None:
        return None
    ib, hh = picked
    if ib % (1 << levels):
        return None
    if (ib >> levels) < 8:
        return None  # deepest band block too thin for sublane tiles

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    out_specs = []
    out_sds = []
    for l in range(levels):
        rr, cc = nr >> (l + 1), nc >> (l + 1)
        bs = pl.BlockSpec((ib >> (l + 1), cc), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        out_specs += [bs] * 3
        out_sds += [jax.ShapeDtypeStruct((rr, cc), jnp.float32)] * 3
    rr, cc = nr >> levels, nc >> levels
    out_specs.append(pl.BlockSpec((ib >> levels, cc), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    out_sds.append(jax.ShapeDtypeStruct((rr, cc), jnp.float32))

    def kern(*refs):
        _wavedec2_kernel(flo, fhi, levels, ib, margins, nc, refs)

    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=out_specs, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(x):
        outs = call(x, x, x)
        # repo pyramid order: [aL, (h,v,d level 1 = finest), ...,
        # (h,v,d level L = deepest)] (core/dwt.wavedec2)
        coeffs = [outs[-1]]
        for l in range(levels):
            coeffs.append((outs[3 * l], outs[3 * l + 1], outs[3 * l + 2]))
        return coeffs

    return fused


def wavedec2_pyramid(x, fb, levels):
    """Full multi-level 2D analysis in one fused kernel; None if this
    configuration is not covered (caller falls back to per-level)."""
    if x.ndim not in (2, 3) or x.dtype != jnp.float32 or levels < 2:
        return None
    nr, nc = x.shape[-2], x.shape[-1]
    f = _build_wavedec2(nr, nc, levels, pk._taps(fb.dec_lo),
                        pk._taps(fb.dec_hi), pk._interpret())
    if f is None:
        return None
    if x.ndim == 3:
        flat = jax.vmap(f)
        outs = flat(x)
        return outs
    return f(x)


# ---------------------------------------------------------------------------
# Synthesis: one kernel, all levels
# ---------------------------------------------------------------------------

def _waverec2_kernel(flo, fhi, levels, ib, margins, nc, refs):
    """refs = a-halo triple + [h,v,d halo triples per level, deepest
    first] + out.  Reconstructs one band of the image."""
    hlen = len(flo)
    h2 = hlen // 2
    n_in = 3 + 9 * levels
    out_ref = refs[n_in]

    def gather(trip, m):
        t, b, bo = trip
        hh = t.shape[0]
        parts = []
        if m:
            parts.append(t[hh - m:, :])
        parts.append(b[:, :])
        if m:
            parts.append(bo[:m, :])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    # deepest approximation, with margin n_L
    nL = margins[levels]
    cur = gather(refs[0:3], nL)  # rows: ib >> levels + 2*nL
    for step, l in enumerate(range(levels, 0, -1)):
        w = nc >> l
        own = ib >> l       # coefficient rows this band owns at level l
        n_l = margins[l]    # margin of cur (and of h/v/d fetch)
        n_prev = margins[l - 1]  # even by _syn_margins construction
        trip_base = 3 + 9 * step
        hr = gather(refs[trip_base: trip_base + 3], n_l)
        vr = gather(refs[trip_base + 3: trip_base + 6], n_l)
        dr = gather(refs[trip_base + 6: trip_base + 9], n_l)

        # rows of a_{l-1} to produce: own*2 + 2*n_prev; coefficient rows
        # consumed start at offset (n_l - n_prev//2 - lp_s) in cur
        lp_s, rp_s = conv.synthesis_pads(hlen, own, 2 * own)
        lout = own + n_prev          # coefficient rows -> 2*lout out rows
        off = n_l - n_prev // 2 - lp_s
        sl = slice(off, off + lp_s + lout + rp_s)
        t1 = pk._synthesis_sub(cur[sl, :], hr[sl, :], flo, fhi, lout,
                               lp_s)
        t2 = pk._synthesis_sub(vr[sl, :], dr[sl, :], flo, fhi, lout,
                               lp_s)
        lpc, rpc = conv.synthesis_pads(hlen, w, 2 * w)
        rec = pk._synthesis_cols(t1, t2, flo, fhi, lpc, rpc, 2 * w)
        if l == 1:
            out_ref[:, :] = rec[n_prev: n_prev + ib, :]
        else:
            cur = rec  # margin n_prev (even), matches margins[l-1] pad


@functools.lru_cache(maxsize=256)
def _build_waverec2(nr, nc, levels, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2 or levels < 2:
        return None
    if nr % (1 << levels) or nc % (1 << levels):
        return None
    margins = _syn_margins(hlen, levels)
    # margins[l] for l=1..levels must be fetchable from halo blocks at
    # each level's granularity
    picked = _pick_band(nr, nc, margins[1], n_bufs=8 + 2 * levels,
                        max_body=256)
    if picked is None:
        return None
    ib, hh = picked
    if ib % (1 << levels):
        return None
    if (ib >> levels) < 8:
        return None

    # check margins fit each level's halo block (halo blocks are hh
    # rows at the IMAGE level; at level l the coeff arrays have nr>>l
    # rows and we fetch halo blocks of hh >> ? -- use per-level specs)
    in_specs = []
    for l in [levels] + [ll for ll in range(levels, 0, -1)
                         for _ in range(3)]:
        rows_l = nr >> l
        blk = ib >> l
        hhl = None
        for cand in (8, 16, 32, 64, 128):
            if (cand >= max(margins[l], 1) and rows_l % cand == 0
                    and blk % cand == 0):
                hhl = cand
                break
        if hhl is None:
            return None
        in_specs.append(pk._halo_specs(blk, hhl, rows_l, nc >> l))
    # flatten triples in order: a_L first, then per level h, v, d
    flat_specs = [s for trip in in_specs for s in trip]

    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)

    # margins must match what _halo_specs can deliver: clamp to hh of
    # each level (already guaranteed by hhl >= margins[l])

    def kern(*refs):
        _waverec2_kernel(flo, fhi, levels, ib, margins, nc, refs)

    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=flat_specs,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(coeffs):
        args = []
        aL = coeffs[0]
        args += [aL, aL, aL]
        # kernel consumes deepest-first; repo order has coeffs[levels]
        # deepest (core/dwt.waverec2)
        for i in range(levels, 0, -1):
            h, v, d = coeffs[i]
            args += [h, h, h, v, v, v, d, d, d]
        return call(*args)

    return fused


def waverec2_pyramid(coeffs, fb, out_shape):
    """Full multi-level 2D synthesis in one fused kernel; None if this
    configuration is not covered."""
    levels = len(coeffs) - 1
    if levels < 2:
        return None
    aL = coeffs[0]
    if aL.dtype != jnp.float32 or aL.ndim not in (2, 3):
        return None
    nr, nc = out_shape[-2], out_shape[-1]
    if (aL.shape[-2] << levels) != nr or (aL.shape[-1] << levels) != nc:
        return None
    for i, (h, v, d) in enumerate(coeffs[1:]):
        want = (nr >> (i + 1), nc >> (i + 1))
        if h.shape[-2:] != want or v.shape[-2:] != want \
                or d.shape[-2:] != want:
            return None
    f = _build_waverec2(nr, nc, levels, pk._taps(fb.rec_lo),
                        pk._taps(fb.rec_hi), pk._interpret())
    if f is None:
        return None
    if aL.ndim == 3:
        return jax.vmap(lambda *flat: f(_unflatten(flat, levels)))(
            *_flatten(coeffs))
    return f(coeffs)


def _flatten(coeffs):
    flat = [coeffs[0]]
    for h, v, d in coeffs[1:]:
        flat += [h, v, d]
    return flat


def _unflatten(flat, levels):
    coeffs = [flat[0]]
    for i in range(levels):
        coeffs.append(tuple(flat[1 + 3 * i: 4 + 3 * i]))
    return coeffs
