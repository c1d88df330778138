"""Fused separable 2D DWT level kernels (Pallas / Mosaic-TPU).

One analysis level of the reference runs as two CUDA kernels with an HBM
round-trip between them (pdwt/src/separable.cu:91-176: pass1 writes the
row-filtered planes to global memory, pass2 re-reads them); the jnp path
inherits the same structure.  Here each level is ONE kernel: a grid program
loads a band of image rows (plus its periodic halo rows, fetched by extra
block inputs whose index maps wrap modulo the grid), runs both separable
passes entirely in VMEM, and writes the four subband tiles.  HBM traffic
per level drops from 2x(in+out) to (in+out).

The synthesis kernel fuses the polyphase upsample-convolve pair
(separable.cu:246-328) the same way: coefficient bands + halos in, one
reconstructed band out.

Mosaic notes (empirically, jax 0.9 / TPU v5e): strided slices and
lane-axis interleaves don't lower, so decimation/interleaving always runs
on the sublane axis — reshape (2n, w)->(n, 2, w) to split parities,
stack+reshape to merge them — and the column pass transposes in VMEM
first.  The row pass therefore runs BEFORE the column pass (separable
passes commute), so only the already-decimated planes are transposed.

Index algebra is identical to pypwt_tpu.core.conv (the correctness oracle);
filters are baked into the kernel as compile-time scalar constants — the
TPU analog of the reference's CUDA constant memory (common.h:15-37).

Only float32, even sizes, and row counts divisible by the band size are
handled; everything else falls back to the jnp path (core/dwt.py dispatch).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import conv

# Flipped to True by tests running on CPU (interpret mode); on a TPU
# backend the kernels compile natively.
_FORCE_INTERPRET = False


def _interpret():
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Band / halo geometry
# ---------------------------------------------------------------------------

# Scoped-VMEM limit passed to Mosaic.  The default limit is 16 MB but the
# chip has far more; raising it lets bands be wide enough that the
# transposed column pass runs with full 128-lane tiles (measured: ib=512
# analysis 83 us vs 161 us at ib=128 on 2048^2 db2).
_VMEM_LIMIT = 100 * 1024 * 1024

# Working-set cap per program.  The estimate in _pick_bands undercounts
# Mosaic's stack temporaries by ~3x, so this sits well below _VMEM_LIMIT.
_VMEM_BUDGET = 30 * 1024 * 1024


# Every _pick_bands decision, keyed by its arguments — benches dump this
# (tools/bench_suite.py) so VMEM-budget drift that silently changes band
# geometry is visible across rounds.
BAND_CHOICES: dict = {}


def _pick_bands(n_rows, n_cols, lpad, rpad, n_bufs, max_body=512,
                budget=None):
    """Choose (body_rows IB, halo_block H) or None if not tileable.

    IB divides n_rows; H divides both n_rows and IB and covers the halo.
    ``n_bufs`` approximates how many band-sized f32 planes live in VMEM at
    once (input band + intermediates + outputs).
    """
    halo = max(lpad, rpad, 1)
    hh = None
    for cand in (8, 16, 32):
        if cand >= halo and n_rows % cand == 0:
            hh = cand
            break
    if hh is None:
        return None
    if budget is None:
        budget = _VMEM_BUDGET
    # ib=1024 preferred where it fits (measured db2 pairs: 2048^2
    # ib=1024 143 us vs ib=512 155 vs whole-image 148.5; 1024^2
    # whole-image ib=1024 33.1 us vs ib=512 36.2)
    cands = [1024] if n_rows >= 1024 else []
    cands += [512, 256, 128, 64, 32, 16, 8]
    for ib in cands:
        if ib > max_body or n_rows % ib or ib % hh:
            continue
        ws = (lpad + ib + rpad + 2 * hh) * n_cols * 4 * n_bufs
        if ws <= budget:
            BAND_CHOICES[(n_rows, n_cols, lpad, rpad, n_bufs, max_body,
                          budget)] = (ib, hh)
            return ib, hh
    BAND_CHOICES[(n_rows, n_cols, lpad, rpad, n_bufs, max_body,
                  budget)] = None
    return None


def _halo_specs(body_rows, halo_rows, total_rows, n_cols):
    """(top, body, bottom) BlockSpecs for one input with periodic row halo.

    The top halo is the ``halo_rows``-row block ending at the band start,
    the bottom halo the block starting at the band end, both wrapped modulo
    the array height — the in-kernel analog of the reference's per-thread
    periodic indexing (separable.cu:112-121).
    """
    bib = body_rows // halo_rows
    gh = total_rows // halo_rows
    top = pl.BlockSpec((halo_rows, n_cols),
                       lambda i, bib=bib, gh=gh: ((i * bib - 1) % gh, 0),
                       memory_space=pltpu.VMEM)
    body = pl.BlockSpec((body_rows, n_cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((halo_rows, n_cols),
                       lambda i, bib=bib, gh=gh: (((i + 1) * bib) % gh, 0),
                       memory_space=pltpu.VMEM)
    return top, body, bot


def _taps(f):
    return tuple(float(v) for v in np.asarray(f, dtype=np.float64))


def _gather_rows(top, body, bot, lpad, rpad):
    """Concatenate halo and body rows into the padded band."""
    hr = top.shape[0]
    parts = []
    if lpad:
        parts.append(top[hr - lpad:, :])
    parts.append(body[:, :])
    if rpad:
        parts.append(bot[:rpad, :])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# In-kernel 1D primitives (same algebra as core/conv.py, sublane axis only)
# ---------------------------------------------------------------------------

def _split_parity(t):
    """(2n, w) -> even rows, odd rows ((n, w) each) without strided slices."""
    n2, w = t.shape
    pairs = t.reshape(n2 // 2, 2, w)
    return pairs[:, 0, :], pairs[:, 1, :]


def _merge_parity(p0, p1):
    """Interleave two (n, w) planes into (2n, w)."""
    n, w = p0.shape
    return jnp.stack([p0, p1], axis=1).reshape(2 * n, w)


def _analysis_sub(t, flo, fhi, L):
    """Decimating analysis along axis 0 of an already-padded array."""
    hlen = len(flo)
    even, odd = _split_parity(t)
    lo = None
    hi = None
    for j in range(hlen):
        src = even if j % 2 == 0 else odd
        seg = src[j // 2: j // 2 + L, :]
        gl, gh = flo[hlen - 1 - j], fhi[hlen - 1 - j]
        lo = seg * gl if lo is None else lo + seg * gl
        hi = seg * gh if hi is None else hi + seg * gh
    return lo, hi


def _pad_lanes_T(t, lpad, rpad):
    """Transpose t and periodically pad the (new) sublane axis — the
    single implementation of the lane-axis wrap used by every kernel
    family (VPU, MXU, non-separable)."""
    tt = t.T
    n = tt.shape[0]
    parts = []
    if lpad:
        parts.append(tt[n - lpad:, :])
    parts.append(tt)
    if rpad:
        parts.append(tt[:rpad, :])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt


def _analysis_cols(t, flo, fhi, lpad, rpad):
    """Decimating analysis along the lane axis via transpose."""
    tp = _pad_lanes_T(t, lpad, rpad)
    n = t.shape[1]
    lo, hi = _analysis_sub(tp, flo, fhi, n // 2)
    return lo.T, hi.T


def _synthesis_sub(lop, hip, flo, fhi, Lout, lpad):
    """Polyphase upsample-convolve along axis 0 of already-padded planes
    (separable.cu:252-287 algebra, shared with conv.synthesis_core)."""
    hlen = len(flo)
    hlen2 = hlen // 2
    sigma = 1 if hlen2 % 2 == 0 else 0
    c = hlen2 // 2
    phases = []
    for p in (0, 1):
        pp = (p + sigma) & 1
        delta = (p + sigma) >> 1
        off = 1 - pp
        base = lpad + delta - c
        acc = None
        for j in range(hlen2):
            tap = hlen - 1 - 2 * j - off
            gl, gh = flo[tap], fhi[tap]
            seg = (lop[base + j: base + j + Lout, :] * gl
                   + hip[base + j: base + j + Lout, :] * gh)
            acc = seg if acc is None else acc + seg
        phases.append(acc)
    return _merge_parity(phases[0], phases[1])


def _synthesis_cols(lo, hi, flo, fhi, lpad, rpad, n_out):
    """Polyphase synthesis along the lane axis via transpose."""
    lop = _pad_lanes_T(lo, lpad, rpad)
    hip = _pad_lanes_T(hi, lpad, rpad)
    return _synthesis_sub(lop, hip, flo, fhi, n_out // 2, lpad).T


# ---------------------------------------------------------------------------
# Fused analysis level
# ---------------------------------------------------------------------------

def _dwt2d_kernel(flo, fhi, lpr, rpr, lpc, rpc, ib,
                  top_ref, body_ref, bot_ref,
                  a_ref, h_ref, v_ref, d_ref):
    rows = _gather_rows(top_ref, body_ref, bot_ref, lpr, rpr)
    # row pass first (passes commute; this transposes half the data)
    lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)
    a, v = _analysis_cols(lo_r, flo, fhi, lpc, rpc)
    h, d = _analysis_cols(hi_r, flo, fhi, lpc, rpc)
    a_ref[:, :] = a
    h_ref[:, :] = h
    v_ref[:, :] = v
    d_ref[:, :] = d


@functools.lru_cache(maxsize=512)
def _build_dwt2d(nr, nc, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2:
        return None  # padded band parity math assumes even filter length
    lp, rp = conv.analysis_pads(hlen)
    # analysis holds few planes live; a raised budget lets 2048-row
    # images run ib=1024 (measured 143 vs 155 us level-0 pair)
    bands = _pick_bands(nr, nc, lp, rp, n_bufs=5, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if ib < 1024 and nr % 1024 == 0 and nc >= 4096:
        # full-width ib=1024 is VMEM-infeasible at this width (the
        # compiler-verified 142.89M/128M failure at 4096 cols): restore
        # the 2048-grade band shape by splitting the grid over column
        # blocks.  Chip-measured (tools/proto_colsplit.py, round 5,
        # level-0 pair at 4096^2): colsplit ib=1024 cb=2048 665.5 us vs
        # 701.7 full-width ib=512; the control confirms full width wins
        # wherever it fits (2048^2: 144.1 vs 156.0), hence the ib<1024
        # guard.
        cs = _build_dwt2d_colsplit(nr, nc, flo, fhi, 1024, 2048,
                                   interpret)
        if cs is not None:
            return cs
    tr, tc = ib // 2, nc // 2
    grid = nr // ib

    top, body, bot = _halo_specs(ib, hh, nr, nc)
    out_spec = pl.BlockSpec((tr, tc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, tc), jnp.float32)

    kern = functools.partial(_dwt2d_kernel, flo, fhi, lp, rp, lp, rp, ib)
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[top, body, bot],
        out_specs=[out_spec] * 4,
        out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def fused(x):
        return call(x, x, x)

    return fused


def dwt2d_fused(x, fb):
    """One fused separable analysis level; None if the kernel doesn't
    cover this configuration (caller falls back to the jnp path)."""
    if x.ndim not in (2, 3) or x.dtype != jnp.float32:
        return None
    nr, nc = x.shape[-2], x.shape[-1]
    if nr % 2 or nc % 2:
        return None
    f = _build_dwt2d(nr, nc, _taps(fb.dec_lo), _taps(fb.dec_hi),
                     _interpret())
    if f is None:
        return None
    if x.ndim == 3:
        return tuple(jax.vmap(f)(x))
    return tuple(f(x))


# ---------------------------------------------------------------------------
# Column-split fused analysis (wide images).
#
# At 4096 cols a full-width ib=1024 band does not fit VMEM (compiler-
# verified: "Used 142.89M of 128.00M", doc/performance.md round 4), so
# full-width geometry is stuck at ib=512.  Splitting the grid over column
# blocks restores the 2048-grade band shape: each program owns an
# (ib x cb) tile plus periodically-wrapped halo blocks on BOTH axes
# (column halos are one 128-lane register tile — the minimum fetch).  The
# lane-axis periodic wrap therefore happens ACROSS grid programs; the
# in-kernel column pass consumes an already lane-padded band instead of
# self-wrapping.
# ---------------------------------------------------------------------------

_COL_HALO = 128  # lane-axis halo block width: one full register tile


def _specs_grid2d(body_rows, halo_rows, total_rows, cb, total_cols):
    """Nine input BlockSpecs (3 row-positions x 3 col-positions), both
    axes wrapping periodically across the grid."""
    bib = body_rows // halo_rows
    gh = total_rows // halo_rows
    bjc = cb // _COL_HALO
    gw = total_cols // _COL_HALO
    rows = ((halo_rows, lambda i: (i * bib - 1) % gh),
            (body_rows, lambda i: i),
            (halo_rows, lambda i: ((i + 1) * bib) % gh))
    cols = ((_COL_HALO, lambda j: (j * bjc - 1) % gw),
            (cb, lambda j: j),
            (_COL_HALO, lambda j: ((j + 1) * bjc) % gw))
    return [pl.BlockSpec((rh, cw),
                         lambda i, j, rm=rm, cm=cm: (rm(i), cm(j)),
                         memory_space=pltpu.VMEM)
            for rh, rm in rows for cw, cm in cols]


def _gather_band2d(refs, lpr, rpr, lpc, rpc):
    """Assemble the two-axis padded band from the nine (row x col)
    blocks; the lane pads are sliced off the 128-wide halo tiles."""
    (t_l, t_c, t_r, m_l, m_c, m_r, b_l, b_c, b_r) = refs
    parts = [_gather_rows(t_c, m_c, b_c, lpr, rpr)]
    if lpc:
        left = _gather_rows(t_l, m_l, b_l, lpr, rpr)
        parts.insert(0, left[:, _COL_HALO - lpc:])
    if rpc:
        right = _gather_rows(t_r, m_r, b_r, lpr, rpr)
        parts.append(right[:, :rpc])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _analysis_cols_prepad(t, flo, fhi, n_out):
    """Decimating analysis along the lane axis of an already lane-padded
    plane (colsplit kernels pad across grid programs — no self-wrap)."""
    lo, hi = _analysis_sub(t.T, flo, fhi, n_out // 2)
    return lo.T, hi.T


def _dwt2d_colsplit_kernel(flo, fhi, lpr, rpr, lpc, rpc, ib, cb, refs):
    in_refs, (a_ref, h_ref, v_ref, d_ref) = refs[:9], refs[9:]
    band = _gather_band2d(in_refs, lpr, rpr, lpc, rpc)
    lo_r, hi_r = _analysis_sub(band, flo, fhi, ib // 2)
    a, v = _analysis_cols_prepad(lo_r, flo, fhi, cb)
    h, d = _analysis_cols_prepad(hi_r, flo, fhi, cb)
    a_ref[:, :] = a
    h_ref[:, :] = h
    v_ref[:, :] = v
    d_ref[:, :] = d


@functools.lru_cache(maxsize=512)
def _build_dwt2d_colsplit(nr, nc, flo, fhi, ib, cb, interpret):
    """Fused analysis level with a (row-band x column-block) grid; None
    if the geometry doesn't tile."""
    hlen = len(flo)
    if hlen % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    if max(lp, rp) > _COL_HALO:
        return None
    halo = max(lp, rp, 1)
    hh = next((c for c in (8, 16, 32)
               if c >= halo and nr % c == 0 and ib % c == 0), None)
    if (hh is None or nr % ib or nc % cb or cb % _COL_HALO
            or cb >= nc or cb % 2):
        return None
    # working-set budget (same shape of estimate as _pick_bands; the
    # band is (rows + halos) x (cols + two 128-lane halo tiles)): an
    # oversized geometry must decline here, not at Mosaic compile time
    ws = (lp + ib + rp + 2 * hh) * (cb + 2 * _COL_HALO) * 4 * 5
    if ws > 52 * 1024 * 1024:
        return None
    in_specs = _specs_grid2d(ib, hh, nr, cb, nc)
    out_spec = pl.BlockSpec((ib // 2, cb // 2), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_colsplit_kernel, flo, fhi,
                             lp, rp, lp, rp, ib, cb)
    call = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(nr // ib, nc // cb),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(*([x] * 9))


# ---------------------------------------------------------------------------
# Fused synthesis level
# ---------------------------------------------------------------------------

def _idwt2d_kernel(flo, fhi, lpr, rpr, lpc, rpc, tc, nc_out,
                   a_top, a_body, a_bot, h_top, h_body, h_bot,
                   v_top, v_body, v_bot, d_top, d_body, d_bot,
                   out_ref):
    ar = _gather_rows(a_top, a_body, a_bot, lpr, rpr)
    hr = _gather_rows(h_top, h_body, h_bot, lpr, rpr)
    vr = _gather_rows(v_top, v_body, v_bot, lpr, rpr)
    dr = _gather_rows(d_top, d_body, d_bot, lpr, rpr)

    # row-axis synthesis (reference pass1, separable.cu:246-287)
    t1 = _synthesis_sub(ar, hr, flo, fhi, tc, lpr)
    t2 = _synthesis_sub(vr, dr, flo, fhi, tc, lpr)

    # column-axis synthesis (reference pass2)
    out_ref[:, :] = _synthesis_cols(t1, t2, flo, fhi, lpc, rpc, nc_out)


@functools.lru_cache(maxsize=512)
def _build_idwt2d(nr_out, nc_out, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    bands = _pick_bands(lrows, w, lp, rp, n_bufs=14, max_body=128)
    if bands is None:
        return None
    tcb, hh = bands  # coefficient rows per program
    if (lp + tcb + rp) % 2:
        return None
    grid = lrows // tcb

    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    in_specs = [top, body, bot] * 4
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)

    kern = functools.partial(_idwt2d_kernel, flo, fhi, lp, rp, lpc, rpc,
                             tcb, nc_out)
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def fused(a, h, v, d):
        return call(a, a, a, h, h, h, v, v, v, d, d, d)

    return fused


def idwt2d_fused(a, h, v, d, fb, out_shape):
    """One fused separable synthesis level; None if uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    if a.dtype != jnp.float32 or a.ndim not in (2, 3):
        return None
    if (nr, nc) != (2 * a.shape[-2], 2 * a.shape[-1]):
        return None  # odd-size levels fall back
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    f = _build_idwt2d(nr, nc, _taps(fb.rec_lo), _taps(fb.rec_hi),
                      _interpret())
    if f is None:
        return None
    if a.ndim == 3:
        return jax.vmap(f)(a, h, v, d)
    return f(a, h, v, d)


# ---------------------------------------------------------------------------
# Statically-shifted fused levels for cycle spinning (VERDICT r2 item 4).
#
# A denoise spin is roll(img, (sr, sc)) -> pyramid -> unroll; only level 0
# touches the rolled image, and on TPU each dynamic 2D roll costs a full
# HBM round trip that cannot fuse into the opaque pallas calls (measured
# ~160 us/spin of pure roll overhead at 2048^2).  Because the spin shifts
# are compile-time constants, the shift folds into the level-0 kernels:
# the analysis kernel reads three consecutive (mod-wrapped) row blocks and
# slices the shifted window at a STATIC offset in VMEM, and shifts
# columns with an in-VMEM lane roll; the synthesis kernel reconstructs
# directly into unshifted position (odd row shifts flip the polyphase
# interleave by one row, handled by computing one extra coefficient row).
# ---------------------------------------------------------------------------


def _roll_sub(t, shift):
    """out[i] = t[(i - shift) mod n] along axis 0 (static shift)."""
    n = t.shape[0]
    s = shift % n
    if s == 0:
        return t
    return jnp.concatenate([t[n - s:, :], t[:n - s, :]], axis=0)


def _analysis_cols_shifted(t, flo, fhi, lpad, rpad, sc):
    """Column analysis of the column-rolled plane (shift by +sc)."""
    tt = _roll_sub(t.T, sc)
    n = tt.shape[0]
    parts = []
    if lpad:
        parts.append(tt[n - lpad:, :])
    parts.append(tt)
    if rpad:
        parts.append(tt[:rpad, :])
    tp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt
    lo, hi = _analysis_sub(tp, flo, fhi, n // 2)
    return lo.T, hi.T


def _apply_thresh(x, beta, mode):
    if mode == "soft":
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - beta, 0)
    if mode == "hard":
        return jnp.where(jnp.abs(x) > beta, x, jnp.zeros_like(x))
    return x


def _dwt2d_shifted_kernel(flo, fhi, lpr, rpr, lpc, rpc, ib, hh, sr, sc,
                          mode, refs):
    if mode is None:
        (top_ref, body_ref, bot_ref, a_ref, h_ref, v_ref, d_ref) = refs
        beta = None
    else:
        (top_ref, body_ref, bot_ref, beta_ref,
         a_ref, h_ref, v_ref, d_ref) = refs
        beta = beta_ref[0, 0]
    # the shifted window [i*ib - lp - sr, ... + lp + ib + rp) sits inside
    # top|body|bot because sr <= hh - lp (builder gate): same HBM traffic
    # as the unshifted kernel, the shift is a static VMEM slice offset
    full = jnp.concatenate([top_ref[:, :], body_ref[:, :],
                            bot_ref[:, :]], axis=0)
    rows = full[hh - lpr - sr: hh - lpr - sr + lpr + ib + rpr, :]
    lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)
    a, v = _analysis_cols_shifted(lo_r, flo, fhi, lpc, rpc, sc)
    h, d = _analysis_cols_shifted(hi_r, flo, fhi, lpc, rpc, sc)
    a_ref[:, :] = a
    h_ref[:, :] = _apply_thresh(h, beta, mode)
    v_ref[:, :] = _apply_thresh(v, beta, mode)
    d_ref[:, :] = _apply_thresh(d, beta, mode)


@functools.lru_cache(maxsize=512)
def _build_dwt2d_shifted(nr, nc, flo, fhi, sr, sc, mode, interpret):
    hlen = len(flo)
    if hlen % 2 or nr % 2 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    # halo must cover the pads PLUS the row shift (callers reduce sr mod
    # 2^levels, so 8..32-row halos cover every useful spin shift)
    bands = _pick_bands(nr, nc, lp + sr, rp, n_bufs=5, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if sr > hh - lp:
        return None
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    in_specs = [top, body, bot]
    if mode is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_shifted_kernel, flo, fhi, lp, rp,
                             lp, rp, ib, hh, sr, sc % nc, mode)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,), in_specs=in_specs,
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    if mode is None:
        return lambda x: call(x, x, x)
    return lambda x, beta: call(
        x, x, x, jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)))


def dwt2d_fused_shifted(x, fb, sr, sc, thresh_mode=None, beta=None):
    """One fused analysis level of roll(x, (sr, sc), (-2, -1)) without
    materializing the roll; with ``thresh_mode`` ("soft"/"hard") the
    detail subbands are thresholded by traced ``beta`` in-kernel before
    the store (the cycle-spin denoise epilogue).  None if uncovered
    (callers should reduce sr mod 2^levels first — the periodized
    pyramid is invariant to larger shifts, and small shifts ride the
    standard halo blocks)."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_dwt2d_shifted(x.shape[0], x.shape[1], _taps(fb.dec_lo),
                             _taps(fb.dec_hi), int(sr) % x.shape[0],
                             int(sc) % x.shape[1], thresh_mode,
                             _interpret())
    if f is None:
        return None
    if thresh_mode is None:
        return tuple(f(x))
    return tuple(f(x, beta))


def _synthesis_cols_unshift(lo, hi, flo, fhi, lpad, rpad, n_out, sc):
    """Column synthesis followed by a lane un-roll (out col c reads
    synthesized col (c + sc) mod n_out)."""
    out = _synthesis_cols(lo, hi, flo, fhi, lpad, rpad, n_out)
    s = sc % n_out
    if s == 0:
        return out
    return jnp.concatenate([out[:, s:], out[:, :s]], axis=1)


def _idwt2d_shifted_kernel(flo, fhi, lpr, rpr, lpc, rpc, tcb, hh,
                           nc_out, sr, sc, accumulate, scale, refs):
    if accumulate:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, acc_ref,
         out_ref) = refs
    else:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, out_ref) = refs
        acc_ref = None
    # band i reconstructs unshifted out rows [i*2tcb, ..+2tcb) = shifted
    # rows + sr: coefficient window [i*tcb + sr//2 - lp, ... tcb+1+rp)
    # sits inside top|body|bot (builder gates sr//2 + 1 + rp <= hh)
    off = hh + (sr // 2) - lpr
    par = sr % 2
    # even sr needs no extra polyphase row: the window is exactly one
    # band and the merged rows land aligned (no slice) — prefer even-sr
    # spin schedules
    lout = tcb + 1 if par else tcb

    def window(t, b, bo):
        full = jnp.concatenate([t[:, :], b[:, :], bo[:, :]], axis=0)
        return full[off: off + lpr + lout + rpr, :]

    ar = window(a_top, a_body, a_bot)
    hr = window(h_top, h_body, h_bot)
    vr = window(v_top, v_body, v_bot)
    dr = window(d_top, d_body, d_bot)
    # odd sr: one extra coefficient row of context — merged rows cover y
    # rows [2*m0, 2*m0 + 2*(tcb+1)) and the band needs [2*m0+1, ..+2*tcb)
    t1 = _synthesis_sub(ar, hr, flo, fhi, lout, lpr)
    t2 = _synthesis_sub(vr, dr, flo, fhi, lout, lpr)
    if par:
        t1 = t1[1: 1 + 2 * tcb, :]
        t2 = t2[1: 1 + 2 * tcb, :]
    rec = _synthesis_cols_unshift(t1, t2, flo, fhi, lpc, rpc, nc_out,
                                  sc)
    out = rec if acc_ref is None else acc_ref[:, :] + rec
    out_ref[:, :] = out if scale == 1.0 else out * scale


@functools.lru_cache(maxsize=512)
def _build_idwt2d_shifted(nr_out, nc_out, flo, fhi, sr, sc, accumulate,
                          scale, interpret):
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    bands = _pick_bands(lrows, w, lp, rp + sr // 2 + 1, n_bufs=14,
                        max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    if sr // 2 + 1 + rp > hh or lp > hh:
        return None
    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
    in_specs = [top, body, bot] * 4
    if accumulate:
        in_specs.append(out_spec)
    kern = functools.partial(_idwt2d_shifted_kernel, flo, fhi, lp, rp,
                             lpc, rpc, tcb, hh, nc_out, sr, sc % nc_out,
                             accumulate, scale)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(lrows // tcb,),
        in_specs=in_specs,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    if accumulate:
        return lambda a, h, v, d, acc: call(
            a, a, a, h, h, h, v, v, v, d, d, d, acc)
    return lambda a, h, v, d: call(a, a, a, h, h, h, v, v, v, d, d, d)


def idwt2d_fused_unshift(a, h, v, d, fb, out_shape, sr, sc, acc=None,
                         scale=1.0):
    """One fused synthesis level producing
    scale * (roll(idwt2d(a, h, v, d), (-sr, -sc), (-2, -1)) [+ acc]),
    with the cycle-spin accumulator and final averaging scale fused into
    the store; None if uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    if a.ndim != 2 or a.dtype != jnp.float32:
        return None
    if (nr, nc) != (2 * a.shape[-2], 2 * a.shape[-1]):
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    f = _build_idwt2d_shifted(nr, nc, _taps(fb.rec_lo), _taps(fb.rec_hi),
                              int(sr) % nr, int(sc) % nc, acc is not None,
                              float(scale), _interpret())
    if f is None:
        return None
    if acc is None:
        return f(a, h, v, d)
    return f(a, h, v, d, acc)


# ---------------------------------------------------------------------------
# Phase-switch fused levels: RANDOM-mode cycle spinning with ZERO dynamic
# data movement.  A periodized decimating level satisfies, exactly,
#
#     A(roll(x, s)) = roll(A(roll(x, s % 2)), s // 2)
#
# (split s = 2q + p inside the convolution sum), so a traced shift
# factorizes through the pyramid: level l only needs the PHASE BITS
# ((s >> l) % 2) of each axis, a 4-way lax.switch over the four
# STATIC-phase kernels, and the residual roll propagates to the next
# level until it vanishes after L levels (s < 2^L).  Detail planes stay
# in residual-rolled coordinates — harmless, because thresholding is
# pointwise and the matching phase-synthesis switches invert level by
# level to the exactly-unrolled image.  Unlike the dynamic-slice /
# dynamic-rotate formulations (Mosaic: no value dynamic_slice; ~137
# us/spin of rotate shuffles; sub-vreg ref starts unprovable), every
# kernel here is one of the measured static-shift kernels.
# ---------------------------------------------------------------------------


def _dwt2d_phasesel_kernel(flo, fhi, lp, rp, ib, hh, mode, refs):
    if mode is None:
        (top_ref, body_ref, bot_ref, s_ref,
         a_ref, h_ref, v_ref, d_ref) = refs
        beta = None
    else:
        (top_ref, body_ref, bot_ref, s_ref, beta_ref,
         a_ref, h_ref, v_ref, d_ref) = refs
        beta = beta_ref[0, 0]
    pr = s_ref[0]
    pc = s_ref[1]
    full = jnp.concatenate([top_ref[:, :], body_ref[:, :],
                            bot_ref[:, :]], axis=0)
    L = lp + ib + rp
    # row phase: in-VMEM select between the two static windows (the
    # whole point vs lax.switch: no XLA conditional, no dynamic op)
    rows = jnp.where(pr == 1, full[hh - lp - 1: hh - lp - 1 + L, :],
                     full[hh - lp: hh - lp + L, :])
    lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)

    def cols(t):
        tt = t.T
        n = tt.shape[0]
        q = jnp.concatenate([tt[n - lp - 1:, :], tt, tt[:rp, :]],
                            axis=0)
        tp = jnp.where(pc == 1, q[0: lp + n + rp, :],
                       q[1: 1 + lp + n + rp, :])
        lo, hi = _analysis_sub(tp, flo, fhi, n // 2)
        return lo.T, hi.T

    a, v = cols(lo_r)
    h, d = cols(hi_r)
    a_ref[:, :] = a
    h_ref[:, :] = _apply_thresh(h, beta, mode)
    v_ref[:, :] = _apply_thresh(v, beta, mode)
    d_ref[:, :] = _apply_thresh(d, beta, mode)


@functools.lru_cache(maxsize=512)
def _build_dwt2d_phasesel(nr, nc, flo, fhi, mode, interpret):
    hlen = len(flo)
    if hlen % 2 or nr % 2 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    bands = _pick_bands(nr, nc, lp + 1, rp, n_bufs=5, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if lp + 1 > hh or lp + 1 > nc:
        return None
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    in_specs = [top, body, bot,
                pl.BlockSpec((2,), lambda i: (0,),
                             memory_space=pltpu.SMEM)]
    if mode is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_phasesel_kernel, flo, fhi, lp, rp,
                             ib, hh, mode)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,), in_specs=in_specs,
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def wrap(x, idx, beta=None):
        sv = jnp.stack([jnp.asarray(idx // 2, jnp.int32),
                        jnp.asarray(idx % 2, jnp.int32)])
        if mode is None:
            return call(x, x, x, sv)
        return call(x, x, x, sv,
                    jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)))

    return wrap


def dwt2d_fused_phase_switch(x, fb, idx, thresh_mode=None, beta=None):
    """One fused analysis level of roll(x, (pr, pc)) for TRACED phase
    bits packed as idx = pr * 2 + pc: ONE kernel whose row/column
    windows are in-VMEM selects between the two static positions per
    axis (lax.switch over four kernels measured ~22 us of conditional
    overhead per level).  None if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_dwt2d_phasesel(x.shape[0], x.shape[1],
                              _taps(fb.dec_lo), _taps(fb.dec_hi),
                              thresh_mode, _interpret())
    if f is None:
        return None
    return tuple(f(x, idx, beta))


def _idwt2d_phasesel_kernel(flo, fhi, lpr, rpr, lpc, rpc, tcb, hh,
                            nc_out, accumulate, scale, refs):
    if accumulate:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, s_ref, acc_ref,
         out_ref) = refs
    else:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, s_ref,
         out_ref) = refs
        acc_ref = None
    pr = s_ref[0]
    pc = s_ref[1]
    lout = tcb + 1

    def window(t, b, bo):
        full = jnp.concatenate([t[:, :], b[:, :], bo[:, :]], axis=0)
        return full[hh - lpr: hh - lpr + lpr + lout + rpr, :]

    ar = window(a_top, a_body, a_bot)
    hr = window(h_top, h_body, h_bot)
    vr = window(v_top, v_body, v_bot)
    dr = window(d_top, d_body, d_bot)
    t1f = _synthesis_sub(ar, hr, flo, fhi, lout, lpr)
    t2f = _synthesis_sub(vr, dr, flo, fhi, lout, lpr)
    # row parity: select between the two static 2*tcb-row windows
    t1 = jnp.where(pr == 1, t1f[1: 1 + 2 * tcb, :],
                   t1f[0: 2 * tcb, :])
    t2 = jnp.where(pr == 1, t2f[1: 1 + 2 * tcb, :],
                   t2f[0: 2 * tcb, :])
    lop = _pad_lanes_T(t1, lpc, rpc)
    hip = _pad_lanes_T(t2, lpc, rpc)
    syn_t = _synthesis_sub(lop, hip, flo, fhi, nc_out // 2, lpc)
    # column parity: unroll by one row of the transposed plane
    u1 = jnp.concatenate([syn_t[1:, :], syn_t[:1, :]], axis=0)
    rec = jnp.where(pc == 1, u1, syn_t).T
    out = rec if acc_ref is None else acc_ref[:, :] + rec
    out_ref[:, :] = out if scale == 1.0 else out * scale


@functools.lru_cache(maxsize=512)
def _build_idwt2d_phasesel(nr_out, nc_out, flo, fhi, accumulate, scale,
                           interpret):
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    bands = _pick_bands(lrows, w, lp, rp + 1, n_bufs=14, max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    if rp + 1 > hh or lp > hh:
        return None
    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
    in_specs = [top, body, bot] * 4
    in_specs.append(pl.BlockSpec((2,), lambda i: (0,),
                                 memory_space=pltpu.SMEM))
    if accumulate:
        in_specs.append(out_spec)
    kern = functools.partial(_idwt2d_phasesel_kernel, flo, fhi, lp, rp,
                             lpc, rpc, tcb, hh, nc_out, accumulate,
                             scale)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(lrows // tcb,),
        in_specs=in_specs,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def wrap(a, h, v, d, idx, acc=None):
        sv = jnp.stack([jnp.asarray(idx // 2, jnp.int32),
                        jnp.asarray(idx % 2, jnp.int32)])
        if accumulate:
            return call(a, a, a, h, h, h, v, v, v, d, d, d, sv, acc)
        return call(a, a, a, h, h, h, v, v, v, d, d, d, sv)

    return wrap


def idwt2d_fused_phase_switch(a, h, v, d, fb, out_shape, idx, acc=None,
                              scale=1.0):
    """One fused synthesis level un-rolling TRACED phase bits
    idx = pr * 2 + pc with in-kernel parity selects; acc/scale fuse
    into the store as in idwt2d_fused_unshift.  None if uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    if a.ndim != 2 or a.dtype != jnp.float32:
        return None
    if (nr, nc) != (2 * a.shape[-2], 2 * a.shape[-1]):
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    f = _build_idwt2d_phasesel(nr, nc, _taps(fb.rec_lo),
                               _taps(fb.rec_hi), acc is not None,
                               float(scale), _interpret())
    if f is None:
        return None
    return f(a, h, v, d, idx, acc)


# ---------------------------------------------------------------------------
# Dynamically-shifted fused levels: RANDOM-mode cycle spinning at the
# static-mode price (VERDICT r4 next #5).  The reference's default
# cycle-spinning mode draws shifts at runtime (wt.cu:242-246), which the
# pipeline previously served with materialized jnp.roll round trips
# (~1.8x the static mode).  Here the shift is a TRACED value, reduced
# mod 2^levels by the caller (the periodized pyramid commutes with 2^L
# translations, and thresholding is pointwise, so the reduction is
# exact): the row window becomes a dynamic-start slice of the same
# top|body|bot halo block the static kernel reads, and the column
# roll+pad becomes a dynamic-start window of a statically over-wrapped
# transposed plane — both sublane-axis dynamic slices, which Mosaic
# lowers natively.  smax = 2^levels - 1 bounds the traced shift and
# sizes the static over-wrap; same HBM traffic as the unshifted kernel.
# ---------------------------------------------------------------------------


def _analysis_cols_dynshift(t, flo, fhi, lpad, rpad, sc, smax, q_ref):
    """Column analysis of the column-rolled plane for a TRACED roll
    +sc in [0, smax]: the transposed plane, over-wrapped by
    (lpad + smax) top rows, is staged in a VMEM scratch ref so the
    rolled+padded window is a cheap dynamic-START ref read
    (q_ref[pl.ds(smax - sc)]) — sublane addressing, no
    tpu.dynamic_rotate shuffles (measured ~137 us/spin of rotate
    overhead at 2048^2) and no value dynamic_slice (no Mosaic
    lowering)."""
    tt = t.T
    n = tt.shape[0]
    parts = [tt[n - (lpad + smax):, :], tt]
    if rpad:
        parts.append(tt[:rpad, :])
    q_ref[:, :] = jnp.concatenate(parts, axis=0)
    tp = q_ref[pl.ds(smax - sc, lpad + n + rpad), :]
    lo, hi = _analysis_sub(tp, flo, fhi, n // 2)
    return lo.T, hi.T


def _dwt2d_dynshift_kernel(flo, fhi, lpr, rpr, lpc, rpc, ib, hh, smax,
                           mode, refs):
    if mode is None:
        (top_ref, body_ref, bot_ref, s_ref,
         a_ref, h_ref, v_ref, d_ref, full_s, q_s) = refs
        beta = None
    else:
        (top_ref, body_ref, bot_ref, s_ref, beta_ref,
         a_ref, h_ref, v_ref, d_ref, full_s, q_s) = refs
        beta = beta_ref[0, 0]
    sr = s_ref[0]
    sc = s_ref[1]
    full_s[:, :] = jnp.concatenate([top_ref[:, :], body_ref[:, :],
                                    bot_ref[:, :]], axis=0)
    # rows[j] = full[hh - lpr - sr + j]: a dynamic-start ref read (the
    # builder gates sr <= hh - lp so the window stays inside the halos)
    rows = full_s[pl.ds(hh - lpr - sr, lpr + ib + rpr), :]
    lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)
    a, v = _analysis_cols_dynshift(lo_r, flo, fhi, lpc, rpc, sc, smax,
                                   q_s)
    h, d = _analysis_cols_dynshift(hi_r, flo, fhi, lpc, rpc, sc, smax,
                                   q_s)
    a_ref[:, :] = a
    h_ref[:, :] = _apply_thresh(h, beta, mode)
    v_ref[:, :] = _apply_thresh(v, beta, mode)
    d_ref[:, :] = _apply_thresh(d, beta, mode)


@functools.lru_cache(maxsize=512)
def _build_dwt2d_dynshift(nr, nc, flo, fhi, smax, mode, interpret):
    hlen = len(flo)
    if hlen % 2 or nr % 2 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    # halo must cover the pads PLUS any shift up to smax
    bands = _pick_bands(nr, nc, lp + smax, rp, n_bufs=5, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if smax > hh - lp or lp + smax > nc:
        return None
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    in_specs = [top, body, bot,
                pl.BlockSpec((2,), lambda i: (0,),
                             memory_space=pltpu.SMEM)]
    if mode is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_dynshift_kernel, flo, fhi, lp, rp,
                             lp, rp, ib, hh, smax, mode)
    scratch = [pltpu.VMEM((2 * hh + ib, nc), jnp.float32),
               pltpu.VMEM((lp + smax + nc + rp, ib // 2), jnp.float32)]
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,), in_specs=in_specs,
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def wrap(x, sr, sc, beta=None):
        s = jnp.stack([jnp.asarray(sr, jnp.int32),
                       jnp.asarray(sc, jnp.int32)])
        if mode is None:
            return call(x, x, x, s)
        return call(x, x, x, s,
                    jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)))

    return wrap


def dwt2d_fused_dynshift(x, fb, sr, sc, smax, thresh_mode=None,
                         beta=None):
    """One fused analysis level of roll(x, (sr, sc), (-2, -1)) for
    TRACED shifts sr, sc in [0, smax] (callers reduce mod 2^levels
    first), without materializing the roll; with ``thresh_mode`` the
    detail subbands are thresholded in-kernel.  None if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_dwt2d_dynshift(x.shape[0], x.shape[1], _taps(fb.dec_lo),
                              _taps(fb.dec_hi), int(smax), thresh_mode,
                              _interpret())
    if f is None:
        return None
    return tuple(f(x, sr, sc, beta))


def _synthesis_cols_dynunshift(lo, hi, flo, fhi, lpad, rpad, n_out,
                               sc, smax, q_ref):
    """Column synthesis followed by a traced lane un-roll (out col c
    reads synthesized col (c + sc) mod n_out): the synthesized
    transposed plane, over-wrapped by smax bottom rows, is staged in a
    VMEM scratch ref and the un-rolled plane is the dynamic-start
    window q_ref[pl.ds(sc)]."""
    lop = _pad_lanes_T(lo, lpad, rpad)
    hip = _pad_lanes_T(hi, lpad, rpad)
    syn_t = _synthesis_sub(lop, hip, flo, fhi, n_out // 2, lpad)
    q_ref[:, :] = jnp.concatenate([syn_t, syn_t[:smax, :]], axis=0)
    return q_ref[pl.ds(sc, n_out), :].T


def _idwt2d_dynshift_kernel(flo, fhi, lpr, rpr, lpc, rpc, tcb, hh,
                            nc_out, smax, accumulate, scale, refs):
    if accumulate:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, s_ref, acc_ref,
         out_ref, win_s, t1_s, t2_s, q_s) = refs
    else:
        (a_top, a_body, a_bot, h_top, h_body, h_bot,
         v_top, v_body, v_bot, d_top, d_body, d_bot, s_ref,
         out_ref, win_s, t1_s, t2_s, q_s) = refs
        acc_ref = None
    sr = s_ref[0]
    sc = s_ref[1]
    par = sr % 2
    # always compute the odd-parity window length (one extra merged row
    # pair); the parity then selects the aligned 2*tcb-row window
    lout = tcb + 1

    def window(t, b, bo):
        # win[j] = full[hh + sr//2 - lpr + j]: one shared scratch ref,
        # dynamic-start read (the read-out VALUE survives the next
        # overwrite; builder gates smax//2 + 1 + rp <= hh)
        win_s[:, :] = jnp.concatenate([t[:, :], b[:, :], bo[:, :]],
                                      axis=0)
        return win_s[pl.ds(hh + sr // 2 - lpr, lpr + lout + rpr), :]

    ar = window(a_top, a_body, a_bot)
    hr = window(h_top, h_body, h_bot)
    vr = window(v_top, v_body, v_bot)
    dr = window(d_top, d_body, d_bot)
    t1_s[:, :] = _synthesis_sub(ar, hr, flo, fhi, lout, lpr)
    t2_s[:, :] = _synthesis_sub(vr, dr, flo, fhi, lout, lpr)
    # parity selection: dynamic-start read of the staged merged planes
    t1 = t1_s[pl.ds(par, 2 * tcb), :]
    t2 = t2_s[pl.ds(par, 2 * tcb), :]
    rec = _synthesis_cols_dynunshift(t1, t2, flo, fhi, lpc, rpc, nc_out,
                                     sc, smax, q_s)
    out = rec if acc_ref is None else acc_ref[:, :] + rec
    out_ref[:, :] = out if scale == 1.0 else out * scale


@functools.lru_cache(maxsize=512)
def _build_idwt2d_dynshift(nr_out, nc_out, flo, fhi, smax, accumulate,
                           scale, interpret):
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    bands = _pick_bands(lrows, w, lp, rp + smax // 2 + 1, n_bufs=14,
                        max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    if smax // 2 + 1 + rp > hh or lp > hh or smax > nc_out:
        return None
    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
    in_specs = [top, body, bot] * 4
    in_specs.append(pl.BlockSpec((2,), lambda i: (0,),
                                 memory_space=pltpu.SMEM))
    if accumulate:
        in_specs.append(out_spec)
    kern = functools.partial(_idwt2d_dynshift_kernel, flo, fhi, lp, rp,
                             lpc, rpc, tcb, hh, nc_out, smax,
                             accumulate, scale)
    scratch = [pltpu.VMEM((2 * hh + tcb, w), jnp.float32),
               pltpu.VMEM((2 * (tcb + 1), w), jnp.float32),
               pltpu.VMEM((2 * (tcb + 1), w), jnp.float32),
               pltpu.VMEM((nc_out + smax, 2 * tcb), jnp.float32)]
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(lrows // tcb,),
        in_specs=in_specs,
        out_specs=out_spec, out_shape=out_sds,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def wrap(a, h, v, d, sr, sc, acc=None):
        s = jnp.stack([jnp.asarray(sr, jnp.int32),
                       jnp.asarray(sc, jnp.int32)])
        if accumulate:
            return call(a, a, a, h, h, h, v, v, v, d, d, d, s, acc)
        return call(a, a, a, h, h, h, v, v, v, d, d, d, s)

    return wrap


def idwt2d_fused_dynunshift(a, h, v, d, fb, out_shape, sr, sc, smax,
                            acc=None, scale=1.0):
    """One fused synthesis level producing
    scale * (roll(idwt2d(a, h, v, d), (-sr, -sc), (-2, -1)) [+ acc])
    for TRACED shifts sr, sc in [0, smax]; None if uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    if a.ndim != 2 or a.dtype != jnp.float32:
        return None
    if (nr, nc) != (2 * a.shape[-2], 2 * a.shape[-1]):
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    f = _build_idwt2d_dynshift(nr, nc, _taps(fb.rec_lo),
                               _taps(fb.rec_hi), int(smax),
                               acc is not None, float(scale),
                               _interpret())
    if f is None:
        return None
    return f(a, h, v, d, sr, sc, acc)


# ---------------------------------------------------------------------------
# Multi-spin level-0 kernels: ALL static spins in one pass.  The
# per-spin shifted kernels still re-read the image once per spin and
# read-modify-write the accumulator; here ONE analysis kernel reads the
# image once and emits every spin's (thresholded) level-0 subbands, and
# ONE synthesis kernel reads every spin's level-0 planes and writes the
# averaged reconstruction once — the cycle-spin traffic floor.
# ---------------------------------------------------------------------------


def _dwt2d_multishift_kernel(flo, fhi, lp, rp, ib, hh, shifts, mode,
                             refs):
    if mode is None:
        top_ref, body_ref, bot_ref = refs[:3]
        outs = refs[3:]
        beta = None
    else:
        top_ref, body_ref, bot_ref, beta_ref = refs[:4]
        outs = refs[4:]
        beta = beta_ref[0, 0]
    full = jnp.concatenate([top_ref[:, :], body_ref[:, :],
                            bot_ref[:, :]], axis=0)
    for k, (sr, sc) in enumerate(shifts):
        rows = full[hh - lp - sr: hh - lp - sr + lp + ib + rp, :]
        lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)
        a, v = _analysis_cols_shifted(lo_r, flo, fhi, lp, rp, sc)
        h, d = _analysis_cols_shifted(hi_r, flo, fhi, lp, rp, sc)
        a_ref, h_ref, v_ref, d_ref = outs[4 * k: 4 * k + 4]
        a_ref[:, :] = a
        h_ref[:, :] = _apply_thresh(h, beta, mode)
        v_ref[:, :] = _apply_thresh(v, beta, mode)
        d_ref[:, :] = _apply_thresh(d, beta, mode)


@functools.lru_cache(maxsize=128)
def _build_dwt2d_multishift(nr, nc, flo, fhi, shifts, mode, interpret):
    hlen = len(flo)
    if hlen % 2 or nr % 2 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    max_sr = max(s[0] for s in shifts)
    n_spins = len(shifts)
    bands = _pick_bands(nr, nc, lp + max_sr, rp,
                        n_bufs=2 + 3 * n_spins, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if max_sr > hh - lp:
        return None
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    in_specs = [top, body, bot]
    if mode is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_multishift_kernel, flo, fhi, lp, rp,
                             ib, hh, shifts, mode)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,), in_specs=in_specs,
        out_specs=[out_spec] * (4 * n_spins),
        out_shape=[out_sds] * (4 * n_spins),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    if mode is None:
        return lambda x: call(x, x, x)
    return lambda x, beta: call(
        x, x, x, jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)))


def dwt2d_fused_multishift(x, fb, shifts, thresh_mode=None, beta=None):
    """Level-0 analyses of roll(x, s) for every static shift s in ONE
    kernel (one image read); returns a list of (a, h, v, d) per shift,
    details thresholded in-kernel when ``thresh_mode`` is set.  None if
    uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    shifts = tuple((int(sr) % x.shape[0], int(sc) % x.shape[1])
                   for sr, sc in shifts)
    f = _build_dwt2d_multishift(x.shape[0], x.shape[1],
                                _taps(fb.dec_lo), _taps(fb.dec_hi),
                                shifts, thresh_mode, _interpret())
    if f is None:
        return None
    flat = f(x) if thresh_mode is None else f(x, beta)
    return [tuple(flat[4 * k: 4 * k + 4]) for k in range(len(shifts))]


def _idwt2d_multiunshift_kernel(flo, fhi, lpr, rpr, lpc, rpc, tcb, hh,
                                nc_out, shifts, scale, refs):
    out_ref = refs[-1]
    acc = None
    for k, (sr, sc) in enumerate(shifts):
        trip = refs[12 * k: 12 * k + 12]
        off = hh + (sr // 2) - lpr
        par = sr % 2
        lout = tcb + 1 if par else tcb

        def window(t, b, bo, off=off, lout=lout):
            full = jnp.concatenate([t[:, :], b[:, :], bo[:, :]], axis=0)
            return full[off: off + lpr + lout + rpr, :]

        ar = window(*trip[0:3])
        hr = window(*trip[3:6])
        vr = window(*trip[6:9])
        dr = window(*trip[9:12])
        t1 = _synthesis_sub(ar, hr, flo, fhi, lout, lpr)
        t2 = _synthesis_sub(vr, dr, flo, fhi, lout, lpr)
        if par:
            t1 = t1[1: 1 + 2 * tcb, :]
            t2 = t2[1: 1 + 2 * tcb, :]
        rec = _synthesis_cols_unshift(t1, t2, flo, fhi, lpc, rpc,
                                      nc_out, sc)
        acc = rec if acc is None else acc + rec
    out_ref[:, :] = acc if scale == 1.0 else acc * scale


@functools.lru_cache(maxsize=128)
def _build_idwt2d_multiunshift(nr_out, nc_out, flo, fhi, shifts, scale,
                               interpret):
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    max_sr = max(s[0] for s in shifts)
    n_spins = len(shifts)
    bands = _pick_bands(lrows, w, lp, rp + max_sr // 2 + 1,
                        n_bufs=6 + 8 * n_spins, max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    if max_sr // 2 + 1 + rp > hh or lp > hh:
        return None
    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
    kern = functools.partial(_idwt2d_multiunshift_kernel, flo, fhi, lp,
                             rp, lpc, rpc, tcb, hh, nc_out, shifts,
                             scale)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(lrows // tcb,),
        in_specs=[top, body, bot] * (4 * n_spins),
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(coeff_sets):
        args = []
        for (a, h, v, d) in coeff_sets:
            args += [a, a, a, h, h, h, v, v, v, d, d, d]
        return call(*args)

    return fused


def idwt2d_fused_multiunshift(coeff_sets, fb, out_shape, shifts,
                              scale=1.0):
    """sum_k scale * roll(idwt2d(*coeff_sets[k]), -shifts[k]) in ONE
    kernel (one output write — the spin-averaging store).  None if
    uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    a0 = coeff_sets[0][0]
    if a0.ndim != 2 or a0.dtype != jnp.float32:
        return None
    if (nr, nc) != (2 * a0.shape[-2], 2 * a0.shape[-1]):
        return None
    for (a, h, v, d) in coeff_sets:
        if not (a.shape == h.shape == v.shape == d.shape == a0.shape):
            return None
    shifts = tuple((int(sr) % nr, int(sc) % nc) for sr, sc in shifts)
    f = _build_idwt2d_multiunshift(nr, nc, _taps(fb.rec_lo),
                                   _taps(fb.rec_hi), shifts,
                                   float(scale), _interpret())
    if f is None:
        return None
    return f(tuple(coeff_sets))


# ---------------------------------------------------------------------------
# Sharded (shard_map-local) fused levels: identical kernels, but the first
# and last grid programs' row-halo blocks are overridden with neighbor-chip
# rows exchanged over the ICI ring (ppermute) — the wrapped index maps stay
# correct for every interior band, so a full 2D level remains ONE kernel
# per chip even when the row axis is sharded across a pod
# (parallel/spatial.py routes here; VERDICT r2 item 1).
# ---------------------------------------------------------------------------


def _edge_override(top_ref, bot_ref, ext_top_ref, ext_bot_ref):
    """Replace the locally-wrapped halo blocks at the shard's edges with
    the exchanged neighbor rows."""
    i = pl.program_id(0)
    ng = pl.num_programs(0)
    top = jnp.where(i == 0, ext_top_ref[:, :], top_ref[:, :])
    bot = jnp.where(i == ng - 1, ext_bot_ref[:, :], bot_ref[:, :])
    return top, bot


def _dwt2d_sharded_kernel(flo, fhi, lpr, rpr, lpc, rpc, ib,
                          top_ref, body_ref, bot_ref, et_ref, eb_ref,
                          a_ref, h_ref, v_ref, d_ref):
    top, bot = _edge_override(top_ref, bot_ref, et_ref, eb_ref)
    rows = _gather_rows(top, body_ref, bot, lpr, rpr)
    lo_r, hi_r = _analysis_sub(rows, flo, fhi, ib // 2)
    a, v = _analysis_cols(lo_r, flo, fhi, lpc, rpc)
    h, d = _analysis_cols(hi_r, flo, fhi, lpc, rpc)
    a_ref[:, :] = a
    h_ref[:, :] = h
    v_ref[:, :] = v
    d_ref[:, :] = d


@functools.lru_cache(maxsize=512)
def build_dwt2d_sharded(nr, nc, flo, fhi, interpret):
    """(fused_fn, halo_rows) for one sharded analysis level, or None.

    ``fused_fn(x, ext_top, ext_bot)`` consumes the (nr, nc) local block
    plus (halo_rows, nc) neighbor-row blocks and returns (a, h, v, d).
    """
    hlen = len(flo)
    if hlen % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    bands = _pick_bands(nr, nc, lp, rp, n_bufs=5, max_body=1024,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    grid = nr // ib
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    kern = functools.partial(_dwt2d_sharded_kernel, flo, fhi, lp, rp,
                             lp, rp, ib)
    call = pl.pallas_call(
        kern, grid=(grid,), in_specs=[top, body, bot, ext, ext],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(x, ext_top, ext_bot):
        return call(x, x, x, ext_top, ext_bot)

    return fused, hh


def _idwt2d_sharded_kernel(flo, fhi, lpr, rpr, lpc, rpc, tc, nc_out,
                           refs):
    (a_top, a_body, a_bot, h_top, h_body, h_bot,
     v_top, v_body, v_bot, d_top, d_body, d_bot,
     a_et, a_eb, h_et, h_eb, v_et, v_eb, d_et, d_eb, out_ref) = refs
    at, ab = _edge_override(a_top, a_bot, a_et, a_eb)
    ht, hb = _edge_override(h_top, h_bot, h_et, h_eb)
    vt, vb = _edge_override(v_top, v_bot, v_et, v_eb)
    dt, db = _edge_override(d_top, d_bot, d_et, d_eb)
    ar = _gather_rows(at, a_body, ab, lpr, rpr)
    hr = _gather_rows(ht, h_body, hb, lpr, rpr)
    vr = _gather_rows(vt, v_body, vb, lpr, rpr)
    dr = _gather_rows(dt, d_body, db, lpr, rpr)
    t1 = _synthesis_sub(ar, hr, flo, fhi, tc, lpr)
    t2 = _synthesis_sub(vr, dr, flo, fhi, tc, lpr)
    out_ref[:, :] = _synthesis_cols(t1, t2, flo, fhi, lpc, rpc, nc_out)


@functools.lru_cache(maxsize=512)
def build_idwt2d_sharded(nr_out, nc_out, flo, fhi, interpret):
    """(fused_fn, halo_rows) for one sharded synthesis level, or None.

    ``fused_fn(a, h, v, d, (a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b))``
    takes the four (nr_out//2, nc_out//2) local planes plus a
    (halo_rows, nc_out//2) neighbor block pair per plane.
    """
    hlen = len(flo)
    if hlen % 2 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    bands = _pick_bands(lrows, w, lp, rp, n_bufs=14, max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    if (lp + tcb + rp) % 2:
        return None
    grid = lrows // tcb
    top, body, bot = _halo_specs(tcb, hh, lrows, w)
    ext = pl.BlockSpec((hh, w), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
    kern = functools.partial(_idwt2d_sharded_kernel, flo, fhi, lp, rp,
                             lpc, rpc, tcb, nc_out)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(grid,),
        in_specs=[top, body, bot] * 4 + [ext] * 8,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(a, h, v, d, halos):
        a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b = halos
        return call(a, a, a, h, h, h, v, v, v, d, d, d,
                    a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b)

    return fused, hh


def _swt2d_sharded_kernel(flo, fhi, lpr, rpr, s, factor, ib, nc,
                          top_ref, body_ref, bot_ref, et_ref, eb_ref,
                          a_ref, h_ref, v_ref, d_ref):
    top, bot = _edge_override(top_ref, bot_ref, et_ref, eb_ref)
    rows = _gather_rows(top, body_ref, bot, lpr, rpr)
    lo_r, hi_r = _swt_sub(rows, flo, fhi, s, factor, lpr, ib)

    def cols(t):
        tt = t.T
        parts = []
        if lpr:
            parts.append(tt[nc - lpr:, :])
        parts.append(tt)
        if rpr:
            parts.append(tt[:rpr, :])
        tp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt
        lo, hi = _swt_sub(tp, flo, fhi, s, factor, lpr, nc)
        return lo.T, hi.T

    a, v = cols(lo_r)
    h, d = cols(hi_r)
    a_ref[:, :] = a
    h_ref[:, :] = h
    v_ref[:, :] = v
    d_ref[:, :] = d


@functools.lru_cache(maxsize=512)
def build_swt2d_sharded(nr, nc, flo, fhi, level, interpret):
    """(fused_fn, halo_rows) for one sharded a-trous analysis level."""
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=False)
    if max(lp, rp) > nc:
        return None  # column (local) axis wrap would need multi-wrap
    bands = _pick_bands_swt(nr, nc, lp, rp, n_bufs=6)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_swt2d_sharded_kernel, flo, fhi, lp, rp, s,
                             factor, ib, nc)
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot, ext, ext],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(x, ext_top, ext_bot):
        return call(x, x, x, ext_top, ext_bot)

    return fused, hh


def _iswt2d_sharded_kernel(flo, fhi, lpr, rpr, s, factor, ib, nc, refs):
    (a_top, a_body, a_bot, h_top, h_body, h_bot,
     v_top, v_body, v_bot, d_top, d_body, d_bot,
     a_et, a_eb, h_et, h_eb, v_et, v_eb, d_et, d_eb, out_ref) = refs
    at, ab = _edge_override(a_top, a_bot, a_et, a_eb)
    ht, hb = _edge_override(h_top, h_bot, h_et, h_eb)
    vt, vb = _edge_override(v_top, v_bot, v_et, v_eb)
    dt, db = _edge_override(d_top, d_bot, d_et, d_eb)
    ar = _gather_rows(at, a_body, ab, lpr, rpr)
    hr = _gather_rows(ht, h_body, hb, lpr, rpr)
    vr = _gather_rows(vt, v_body, vb, lpr, rpr)
    dr = _gather_rows(dt, d_body, db, lpr, rpr)
    t1 = _swt_combine_sub(ar, hr, flo, fhi, s, factor, lpr, ib)
    t2 = _swt_combine_sub(vr, dr, flo, fhi, s, factor, lpr, ib)

    def cols(lo, hi):
        lot = lo.T
        hit = hi.T
        parts_l = [lot[nc - lpr:, :], lot, lot[:rpr, :]]
        parts_h = [hit[nc - lpr:, :], hit, hit[:rpr, :]]
        parts_l = [p for p in parts_l if p.shape[0]]
        parts_h = [p for p in parts_h if p.shape[0]]
        lop = (jnp.concatenate(parts_l, axis=0) if len(parts_l) > 1
               else lot)
        hip = (jnp.concatenate(parts_h, axis=0) if len(parts_h) > 1
               else hit)
        return _swt_combine_sub(lop, hip, flo, fhi, s, factor, lpr, nc).T

    out_ref[:, :] = cols(t1, t2)


@functools.lru_cache(maxsize=512)
def build_iswt2d_sharded(nr, nc, flo, fhi, level, interpret):
    """(fused_fn, halo_rows) for one sharded a-trous synthesis level."""
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=True)
    if max(lp, rp) > nc:
        return None
    bands = _pick_bands_swt(nr, nc, lp, rp, n_bufs=14)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_iswt2d_sharded_kernel, flo, fhi, lp, rp, s,
                             factor, ib, nc)
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,),
        in_specs=[top, body, bot] * 4 + [ext] * 8,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(a, h, v, d, halos):
        a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b = halos
        return call(a, a, a, h, h, h, v, v, v, d, d, d,
                    a_t, a_b, h_t, h_b, v_t, v_b, d_t, d_b)

    return fused, hh


# ---------------------------------------------------------------------------
# Padded-core kernels: analysis/synthesis of ALREADY-PADDED arrays (no
# wrap) — the Pallas form of conv.analysis_core/synthesis_core.  These
# serve the grid-sharded and seq-sharded paths (parallel/spatial.py),
# where the pads come from a ppermute halo exchange rather than local
# periodicity, along either the lane axis (last) or the sublane axis
# (rows), so the sharded per-chip compute needs no HBM transposes.
# ---------------------------------------------------------------------------


def _ana_padded_lanes_kernel(flo, fhi, L, body_ref, lo_ref, hi_ref):
    tp = body_ref[:, :].T
    lo, hi = _analysis_sub(tp, flo, fhi, L)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


@functools.lru_cache(maxsize=512)
def build_ana_padded_lanes(nr, ncp, L, flo, fhi, interpret):
    """Decimating analysis along the last axis of an (nr, ncp) padded
    array -> two (nr, L) outputs; None if uncovered."""
    hlen = len(flo)
    if hlen % 2 or ncp % 2:
        return None
    bands = _pick_bands(nr, ncp, 0, 0, n_bufs=5)
    if bands is None:
        return None
    ib, _ = bands
    body = pl.BlockSpec((ib, ncp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, L), jnp.float32)
    kern = functools.partial(_ana_padded_lanes_kernel, flo, fhi, L)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def _syn_padded_lanes_kernel(flo, fhi, n_out, lpad, a_ref, d_ref,
                             out_ref):
    out_ref[:, :] = _synthesis_sub(a_ref[:, :].T, d_ref[:, :].T, flo,
                                   fhi, n_out // 2, lpad).T


@functools.lru_cache(maxsize=512)
def build_syn_padded_lanes(nr, Lp, n_out, lpad, flo, fhi, interpret):
    """Polyphase synthesis along the last axis of two (nr, Lp) padded
    coefficient arrays -> (nr, n_out); None if uncovered."""
    hlen = len(flo)
    if hlen % 2 or n_out % 2:
        return None
    bands = _pick_bands(nr, max(Lp, n_out), 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    in_spec = pl.BlockSpec((ib, Lp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, n_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, n_out), jnp.float32)
    kern = functools.partial(_syn_padded_lanes_kernel, flo, fhi, n_out,
                             lpad)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def _ana_padded_rows_kernel(flo, fhi, L, body_ref, lo_ref, hi_ref):
    lo, hi = _analysis_sub(body_ref[:, :], flo, fhi, L)
    lo_ref[:, :] = lo
    hi_ref[:, :] = hi


@functools.lru_cache(maxsize=512)
def build_ana_padded_rows(nrp, nc, L, flo, fhi, interpret):
    """Decimating analysis along the ROW axis of an (nrp, nc) padded
    array -> two (L, nc) outputs (no transposes anywhere)."""
    hlen = len(flo)
    if hlen % 2 or nrp % 2:
        return None
    cb = None
    for cand in (512, 256, 128):
        if nc % cand == 0 and nrp * cand * 4 * 5 <= _VMEM_BUDGET:
            cb = cand
            break
    if cb is None:
        return None
    body = pl.BlockSpec((nrp, cb), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((L, nc), jnp.float32)
    kern = functools.partial(_ana_padded_rows_kernel, flo, fhi, L)
    return pl.pallas_call(
        kern, grid=(nc // cb,), in_specs=[body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def _syn_padded_rows_kernel(flo, fhi, n_out, lpad, a_ref, d_ref,
                            out_ref):
    out_ref[:, :] = _synthesis_sub(a_ref[:, :], d_ref[:, :], flo, fhi,
                                   n_out // 2, lpad)


@functools.lru_cache(maxsize=512)
def build_syn_padded_rows(Lp, nc, n_out, lpad, flo, fhi, interpret):
    """Polyphase synthesis along the ROW axis of two (Lp, nc) padded
    coefficient arrays -> (n_out, nc)."""
    hlen = len(flo)
    if hlen % 2 or n_out % 2:
        return None
    cb = None
    for cand in (512, 256, 128):
        if nc % cand == 0 and max(Lp, n_out) * cand * 4 * 8 \
                <= _VMEM_BUDGET:
            cb = cand
            break
    if cb is None:
        return None
    in_spec = pl.BlockSpec((Lp, cb), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_out, nc), jnp.float32)
    kern = functools.partial(_syn_padded_rows_kernel, flo, fhi, n_out,
                             lpad)
    return pl.pallas_call(
        kern, grid=(nc // cb,), in_specs=[in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


# ---------------------------------------------------------------------------
# Fused stationary (a-trous) levels — no decimation, dilated filters
# (separable.cu:409-493 analysis, :553-626 synthesis)
# ---------------------------------------------------------------------------

def _swt_pads(hlen, level, inverse):
    factor = 1 << (level - 1)
    if inverse:
        s = hlen // 2 - 1 if hlen % 2 == 0 else hlen // 2
    else:
        s = hlen // 2
    return (hlen - 1 - s) * factor, max(s, 0) * factor, s, factor


def _swt_sub(t, flo, fhi, s, factor, lpad, L, scale=1.0):
    """A-trous filtering along axis 0 of an already-padded array."""
    hlen = len(flo)
    lo = None
    hi = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = t[ofs: ofs + L, :]
        # reference tap order: flo[k] applied at offset (s-k)*factor
        # (separable.cu:409-448 / conv.swt_analysis_last)
        gl, gh = flo[k] * scale, fhi[k] * scale
        lo = seg * gl if lo is None else lo + seg * gl
        hi = seg * gh if hi is None else hi + seg * gh
    return lo, hi


def _swt_combine_sub(lop, hip, flo, fhi, s, factor, lpad, L):
    """Synthesis combine: sum_k (lo*flo[k] + hi*fhi[k])/2 at dilated
    offsets, along axis 0 of padded planes."""
    hlen = len(flo)
    out = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = (lop[ofs: ofs + L, :] * (flo[k] * 0.5)
               + hip[ofs: ofs + L, :] * (fhi[k] * 0.5))
        out = seg if out is None else out + seg
    return out


def _swt2d_kernel(flo, fhi, lpr, rpr, s, factor, ib, nc,
                  top_ref, body_ref, bot_ref,
                  a_ref, h_ref, v_ref, d_ref):
    rows = _gather_rows(top_ref, body_ref, bot_ref, lpr, rpr)
    lo_r, hi_r = _swt_sub(rows, flo, fhi, s, factor, lpr, ib)

    def cols(t):
        tt = t.T
        parts = []
        if lpr:
            parts.append(tt[nc - lpr:, :])
        parts.append(tt)
        if rpr:
            parts.append(tt[:rpr, :])
        tp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt
        lo, hi = _swt_sub(tp, flo, fhi, s, factor, lpr, nc)
        return lo.T, hi.T

    a, v = cols(lo_r)
    h, d = cols(hi_r)
    a_ref[:, :] = a
    h_ref[:, :] = h
    v_ref[:, :] = v
    d_ref[:, :] = d


@functools.lru_cache(maxsize=512)
def _build_swt2d(nr, nc, flo, fhi, level, interpret):
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=False)
    bands = _pick_bands_swt(nr, nc, lp, rp, n_bufs=6)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_swt2d_kernel, flo, fhi, lp, rp, s, factor,
                             ib, nc)
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=[out_spec] * 4, out_shape=[out_sds] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(x):
        return call(x, x, x)

    return fused


def _pick_bands_swt(n_rows, n_cols, lpad, rpad, n_bufs):
    """Like _pick_bands but with larger halo blocks (dilated supports)."""
    halo = max(lpad, rpad, 1)
    hh = None
    for cand in (8, 16, 32, 64, 128, 256):
        if cand >= halo and n_rows % cand == 0:
            hh = cand
            break
    if hh is None:
        return None
    for ib in (512, 256, 128, 64, 32, 16, 8):
        if n_rows % ib or ib % hh:
            continue
        ws = (lpad + ib + rpad + 2 * hh) * n_cols * 4 * n_bufs
        if ws <= _VMEM_BUDGET:
            return ib, hh
    return None


def swt2d_level_fused(x, fb, level):
    """One fused stationary analysis level; None if uncovered."""
    if x.ndim not in (2, 3) or x.dtype != jnp.float32:
        return None
    nr, nc = x.shape[-2], x.shape[-1]
    hlen = fb.hlen
    lp, rp, _, _ = _swt_pads(hlen, level, inverse=False)
    if max(lp, rp) > min(nr, nc):
        return None  # support exceeds image; jnp path wraps correctly
    f = _build_swt2d(nr, nc, _taps(fb.dec_lo), _taps(fb.dec_hi), level,
                     _interpret())
    if f is None:
        return None
    if x.ndim == 3:
        return tuple(jax.vmap(f)(x))
    return tuple(f(x))


def _iswt2d_kernel(flo, fhi, lpr, rpr, s, factor, ib, nc,
                   a_top, a_body, a_bot, h_top, h_body, h_bot,
                   v_top, v_body, v_bot, d_top, d_body, d_bot,
                   out_ref):
    ar = _gather_rows(a_top, a_body, a_bot, lpr, rpr)
    hr = _gather_rows(h_top, h_body, h_bot, lpr, rpr)
    vr = _gather_rows(v_top, v_body, v_bot, lpr, rpr)
    dr = _gather_rows(d_top, d_body, d_bot, lpr, rpr)

    t1 = _swt_combine_sub(ar, hr, flo, fhi, s, factor, lpr, ib)
    t2 = _swt_combine_sub(vr, dr, flo, fhi, s, factor, lpr, ib)

    def cols(lo, hi):
        lot = lo.T
        hit = hi.T
        parts_l = [lot[nc - lpr:, :], lot, lot[:rpr, :]]
        parts_h = [hit[nc - lpr:, :], hit, hit[:rpr, :]]
        parts_l = [p for p in parts_l if p.shape[0]]
        parts_h = [p for p in parts_h if p.shape[0]]
        lop = (jnp.concatenate(parts_l, axis=0) if len(parts_l) > 1
               else lot)
        hip = (jnp.concatenate(parts_h, axis=0) if len(parts_h) > 1
               else hit)
        return _swt_combine_sub(lop, hip, flo, fhi, s, factor, lpr, nc).T

    out_ref[:, :] = cols(t1, t2)


@functools.lru_cache(maxsize=512)
def _build_iswt2d(nr, nc, flo, fhi, level, interpret):
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=True)
    bands = _pick_bands_swt(nr, nc, lp, rp, n_bufs=14)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, nc)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_iswt2d_kernel, flo, fhi, lp, rp, s, factor,
                             ib, nc)
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot] * 4,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    def fused(a, h, v, d):
        return call(a, a, a, h, h, h, v, v, v, d, d, d)

    return fused


def iswt2d_level_fused(a, h, v, d, fb, level):
    """One fused stationary synthesis level; None if uncovered."""
    if a.ndim not in (2, 3) or a.dtype != jnp.float32:
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    nr, nc = a.shape[-2], a.shape[-1]
    hlen = fb.hlen
    lp, rp, _, _ = _swt_pads(hlen, level, inverse=True)
    if max(lp, rp) > min(nr, nc):
        return None
    f = _build_iswt2d(nr, nc, _taps(fb.rec_lo), _taps(fb.rec_hi), level,
                      _interpret())
    if f is None:
        return None
    if a.ndim == 3:
        return jax.vmap(f)(a, h, v, d)
    return f(a, h, v, d)


# ---------------------------------------------------------------------------
# Fused batched-1D levels (rows independent: no halos, lane-axis transform
# via the transposed sublane pass; separable.cu:214-236 / :368-395)
# ---------------------------------------------------------------------------

def _dwt1d_kernel(flo, fhi, lpc, rpc, body_ref, lo_ref, hi_ref):
    lo, hi = _analysis_cols(body_ref[:, :], flo, fhi, lpc, rpc)
    lo_ref[:, :] = lo
    hi_ref[:, :] = hi


@functools.lru_cache(maxsize=512)
def _build_dwt1d(nr, nc, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    bands = _pick_bands(nr, nc, 0, 0, n_bufs=5)
    if bands is None:
        return None
    ib, _ = bands
    body = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc // 2), jnp.float32)
    kern = functools.partial(_dwt1d_kernel, flo, fhi, lp, rp)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def dwt1d_fused(x, fb):
    """One fused batched-1D analysis level; None if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_dwt1d(x.shape[0], x.shape[1], _taps(fb.dec_lo),
                     _taps(fb.dec_hi), _interpret())
    if f is None:
        return None
    return tuple(f(x))


def _idwt1d_kernel(flo, fhi, lpc, rpc, n_out, a_ref, d_ref, out_ref):
    out_ref[:, :] = _synthesis_cols(a_ref[:, :], d_ref[:, :], flo, fhi,
                                    lpc, rpc, n_out)


@functools.lru_cache(maxsize=512)
def _build_idwt1d(nr, L, n_out, flo, fhi, interpret):
    hlen = len(flo)
    if hlen % 2 or n_out != 2 * L:
        return None
    lp, rp = conv.synthesis_pads(hlen, L, n_out)
    bands = _pick_bands(nr, n_out, 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    in_spec = pl.BlockSpec((ib, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, n_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, n_out), jnp.float32)
    kern = functools.partial(_idwt1d_kernel, flo, fhi, lp, rp, n_out)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def idwt1d_fused(a, d, fb, n_out):
    """One fused batched-1D synthesis level; None if uncovered."""
    if a.ndim != 2 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    f = _build_idwt1d(a.shape[0], a.shape[1], n_out, _taps(fb.rec_lo),
                      _taps(fb.rec_hi), _interpret())
    if f is None:
        return None
    return f(a, d)


# ---------------------------------------------------------------------------
# Fused batched-1D stationary levels (lane-axis a-trous via transpose)
# ---------------------------------------------------------------------------

def _swt1d_kernel(flo, fhi, lp, rp, s, factor, nc,
                  body_ref, lo_ref, hi_ref):
    tt = body_ref[:, :].T
    parts = []
    if lp:
        parts.append(tt[nc - lp:, :])
    parts.append(tt)
    if rp:
        parts.append(tt[:rp, :])
    tp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt
    lo, hi = _swt_sub(tp, flo, fhi, s, factor, lp, nc)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


@functools.lru_cache(maxsize=512)
def _build_swt1d(nr, nc, flo, fhi, level, interpret):
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=False)
    if max(lp, rp) > nc:
        return None
    bands = _pick_bands(nr, nc, 0, 0, n_bufs=6)
    if bands is None:
        return None
    ib, _ = bands
    body = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_swt1d_kernel, flo, fhi, lp, rp, s, factor,
                             nc)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def swt1d_level_fused(x, fb, level):
    """One fused batched-1D stationary analysis level; None if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_swt1d(x.shape[0], x.shape[1], _taps(fb.dec_lo),
                     _taps(fb.dec_hi), level, _interpret())
    if f is None:
        return None
    return tuple(f(x))


def _iswt1d_kernel(flo, fhi, lp, rp, s, factor, nc,
                   a_ref, d_ref, out_ref):
    def padded(ref):
        tt = ref[:, :].T
        parts = []
        if lp:
            parts.append(tt[nc - lp:, :])
        parts.append(tt)
        if rp:
            parts.append(tt[:rp, :])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else tt

    lop = padded(a_ref)
    hip = padded(d_ref)
    # 1D inverse rescales by 1/2 once (vs 1/2 per axis in 2D):
    # _swt_combine_sub applies exactly one 0.5
    out_ref[:, :] = _swt_combine_sub(lop, hip, flo, fhi, s, factor, lp,
                                     nc).T


@functools.lru_cache(maxsize=512)
def _build_iswt1d(nr, nc, flo, fhi, level, interpret):
    hlen = len(flo)
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=True)
    if max(lp, rp) > nc:
        return None
    bands = _pick_bands(nr, nc, 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    spec = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc), jnp.float32)
    kern = functools.partial(_iswt1d_kernel, flo, fhi, lp, rp, s, factor,
                             nc)
    return pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[spec, spec],
        out_specs=spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)


def iswt1d_level_fused(a, d, fb, level):
    """One fused batched-1D stationary synthesis level; None if
    uncovered."""
    if a.ndim != 2 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    f = _build_iswt1d(a.shape[0], a.shape[1], _taps(fb.rec_lo),
                      _taps(fb.rec_hi), level, _interpret())
    if f is None:
        return None
    return f(a, d)


# ---------------------------------------------------------------------------
# Long-1D: fused kernels on folded rows.  A single long signal is viewed
# as (rows, cols); each row's periodic lane pads come from its neighbour
# rows' tails/heads, built INSIDE the kernel from sublane-shifted planes
# plus 1-row wrap halos (xla-side fold-pad materialization measured one
# extra HBM round trip per level: 121 vs 109 us for a 4Mi analysis).
# Pads wider than one row (deep SWT dilations) fall back to the jnp
# multi-row fold (conv.fold_rows_analysis).
#
# Wide-filter VMEM cliff (round-4 measured: hlen >= 12 degrades ~8x at
# ib=512): every tap slice of the TRANSPOSED fold is an unaligned
# sublane relayout of the whole (c + pads, ib) plane, and Mosaic keeps
# ~hlen of them live.  The "scratch" variants materialize the
# transposed (and parity-split) plane into explicit VMEM scratch refs
# ONCE; the tap loop then reads small ref slices, so live temporaries no
# longer scale with hlen.  Variant + band cap are probe knobs
# (PYPWT_LONGFOLD / PYPWT_LONG_MAXBODY) resolved to chip-measured
# defaults in _long_variant/_long_max_body.
# ---------------------------------------------------------------------------


def _long_variant(family="dwt"):
    """Fold-kernel variant, chip-measured (round 5,
    tools/proto_longfold_r5.py): at the >= 128-row foldings the
    scratch-ref form wins BOTH families at every width it covers
    (DWT db4 L5 roundtrip 260.3 us scratch vs 408.4 plain; SWT L3
    db2 507.6 vs 540.3, db6 564.5 vs 750.4, sym8 612.9 vs plain
    VMEM-error).  An earlier per-family split ("plain" for SWT) came
    from the pre-round-5 narrow foldings and silently sent wide SWT
    banks to the jnp fold (bench floor gate caught it: sym8 L3 4Mi at
    1925 us vs 613 forced-scratch).  PYPWT_LONGFOLD overrides (probe
    knob); the plain form keeps its hlen < 14 coverage guard."""
    v = os.environ.get("PYPWT_LONGFOLD", "")
    if v:
        return v
    return "scratch"


def _long_max_body():
    v = os.environ.get("PYPWT_LONG_MAXBODY", "")
    return int(v) if v else 512


def _analysis_sub_ref(even_ref, odd_ref, flo, fhi, L):
    """_analysis_sub over parity planes pre-materialized in VMEM scratch
    refs (each tap reads a small ref slice instead of re-deriving a
    relayout of the whole transposed plane)."""
    hlen = len(flo)
    lo = None
    hi = None
    for j in range(hlen):
        src = even_ref if j % 2 == 0 else odd_ref
        seg = src[j // 2: j // 2 + L, :]
        gl, gh = flo[hlen - 1 - j], fhi[hlen - 1 - j]
        lo = seg * gl if lo is None else lo + seg * gl
        hi = seg * gh if hi is None else hi + seg * gh
    return lo, hi


def _synthesis_sub_ref(lop_ref, hip_ref, flo, fhi, Lout, lpad):
    """_synthesis_sub reading from pre-materialized scratch refs."""
    hlen = len(flo)
    hlen2 = hlen // 2
    sigma = 1 if hlen2 % 2 == 0 else 0
    c = hlen2 // 2
    phases = []
    for p in (0, 1):
        pp = (p + sigma) & 1
        delta = (p + sigma) >> 1
        off = 1 - pp
        base = lpad + delta - c
        acc = None
        for j in range(hlen2):
            tap = hlen - 1 - 2 * j - off
            gl, gh = flo[tap], fhi[tap]
            seg = (lop_ref[base + j: base + j + Lout, :] * gl
                   + hip_ref[base + j: base + j + Lout, :] * gh)
            acc = seg if acc is None else acc + seg
        phases.append(acc)
    return _merge_parity(phases[0], phases[1])


def _swt_sub_ref(tp_ref, flo, fhi, s, factor, lpad, L, scale=1.0):
    """_swt_sub reading from a pre-materialized scratch ref."""
    hlen = len(flo)
    lo = None
    hi = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = tp_ref[ofs: ofs + L, :]
        gl, gh = flo[k] * scale, fhi[k] * scale
        lo = seg * gl if lo is None else lo + seg * gl
        hi = seg * gh if hi is None else hi + seg * gh
    return lo, hi


def _swt_combine_sub_ref(lop_ref, hip_ref, flo, fhi, s, factor, lpad, L):
    """_swt_combine_sub reading from pre-materialized scratch refs."""
    hlen = len(flo)
    out = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = (lop_ref[ofs: ofs + L, :] * (flo[k] * 0.5)
               + hip_ref[ofs: ofs + L, :] * (fhi[k] * 0.5))
        out = seg if out is None else out + seg
    return out

def _long_variant_covers(variant, hlen, atrous=False):
    """Chip-measured width caps per fold variant (round 5,
    tools/proto_longfold_r5.py): the plain value-temporary fold blows
    VMEM from hlen ~14-16 (sym8 JaxRuntimeError at the >=128-row
    foldings), the scratch DWT kernels from ~18-20 (db10), while the
    scratch a-trous kernels are proven through hlen 20.  Wider
    geometries must DECLINE here (jnp fold or banded MXU serve them)
    instead of failing at run time."""
    if variant == "plain":
        return hlen < 14
    return hlen < (22 if atrous else 18)


def _fold_pad(top_ref, body_ref, bot_ref, lp, rp):
    """In-VMEM lane pads of a folded long-1D plane: row i's left pad is
    row i-1's tail, right pad row i+1's head; the first/last rows of the
    band take them from the wrapped halo blocks."""
    body = body_ref[:, :]
    c = body.shape[1]
    hh = top_ref.shape[0]
    parts = []
    if lp:
        prev = jnp.concatenate([top_ref[hh - 1: hh, :], body[:-1, :]],
                               axis=0)
        parts.append(prev[:, c - lp:])
    parts.append(body)
    if rp:
        nxt = jnp.concatenate([body[1:, :], bot_ref[0:1, :]], axis=0)
        parts.append(nxt[:, :rp])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else body


def _long1d_bands(nr, c, lp, rp, hlen, n_bufs, max_body=512):
    """(ib, hh) for a folded plane, or None.  Declines multi-row pads
    and the wide-filter x narrow-fold VMEM blowup (transposed planes
    have ib lanes; below 128 Mosaic pads per-tap temporaries to full
    128-lane tiles — a db8 at 32 folded rows measured 142 MB VMEM).
    The raised budget keeps ib = 128 feasible at the widest (8192-col)
    foldings — the default 30 MB pushed every synthesis geometry to
    64-lane transposed tiles (round-5 finding)."""
    if max(lp, rp) > c:
        return None
    bands = _pick_bands(nr, c, 1, 1, n_bufs=n_bufs, max_body=max_body,
                        budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    if ib < 128 and hlen * (c + lp + rp) * 128 * 4 > 48 * 1024 * 1024:
        return None
    return ib, hh


def _dwt1d_long_kernel(flo, fhi, lp, rp, L,
                       top_ref, body_ref, bot_ref, lo_ref, hi_ref):
    tp = _fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
    lo, hi = _analysis_sub(tp, flo, fhi, L)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


def _dwt1d_long_kernel_s(flo, fhi, lp, rp, L,
                         top_ref, body_ref, bot_ref, lo_ref, hi_ref,
                         ev_ref, od_ref):
    tp = _fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
    pairs = tp.reshape(tp.shape[0] // 2, 2, tp.shape[1])
    ev_ref[:, :] = pairs[:, 0, :]
    od_ref[:, :] = pairs[:, 1, :]
    lo, hi = _analysis_sub_ref(ev_ref, od_ref, flo, fhi, L)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


@functools.lru_cache(maxsize=512)
def _build_dwt1d_long(nr, c, lp, rp, flo, fhi, interpret,
                      variant="plain", max_body=512):
    hlen = len(flo)
    if hlen % 2 or c % 2 or (c + lp + rp) % 2:
        return None
    if not _long_variant_covers(variant, hlen):
        return None
    bands = _long1d_bands(nr, c, lp, rp, hlen,
                          n_bufs=7 if variant == "scratch" else 6,
                          max_body=max_body)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, c)
    out_spec = pl.BlockSpec((ib, c // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c // 2), jnp.float32)
    if variant == "scratch":
        kern = functools.partial(_dwt1d_long_kernel_s, flo, fhi, lp, rp,
                                 c // 2)
        scratch = [pltpu.VMEM(((c + lp + rp) // 2, ib), jnp.float32)] * 2
    else:
        kern = functools.partial(_dwt1d_long_kernel, flo, fhi, lp, rp,
                                 c // 2)
        scratch = []
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)
    return lambda x2: call(x2, x2, x2)


def dwt1d_long_fused(x, fb, rc):
    """One analysis level of a long 1D signal via the folded-plane
    kernel; None if uncovered (caller falls back to the jnp path)."""
    if x.ndim != 1 or x.dtype != jnp.float32:
        return None
    r, c = rc
    lp, rp = conv.analysis_pads(fb.hlen)
    f = _build_dwt1d_long(r, c, lp, rp, _taps(fb.dec_lo),
                          _taps(fb.dec_hi), _interpret(),
                          _long_variant(), _long_max_body())
    if f is None:
        return None
    lo, hi = f(x.reshape(r, c))
    return lo.reshape(-1), hi.reshape(-1)


def _idwt1d_long_kernel(flo, fhi, lp, rp, c, refs):
    a_top, a_body, a_bot, d_top, d_body, d_bot, out_ref = refs
    ap = _fold_pad(a_top, a_body, a_bot, lp, rp)
    dp = _fold_pad(d_top, d_body, d_bot, lp, rp)
    out_ref[:, :] = _synthesis_sub(ap.T, dp.T, flo, fhi, c, lp).T


def _idwt1d_long_kernel_s(flo, fhi, lp, rp, c, refs):
    (a_top, a_body, a_bot, d_top, d_body, d_bot, out_ref,
     ap_ref, dp_ref) = refs
    ap_ref[:, :] = _fold_pad(a_top, a_body, a_bot, lp, rp).T
    dp_ref[:, :] = _fold_pad(d_top, d_body, d_bot, lp, rp).T
    out_ref[:, :] = _synthesis_sub_ref(ap_ref, dp_ref, flo, fhi, c,
                                       lp).T


@functools.lru_cache(maxsize=512)
def _build_idwt1d_long(nr, c, lp, rp, flo, fhi, interpret,
                       variant="plain", max_body=512):
    hlen = len(flo)
    if hlen % 2:
        return None
    if not _long_variant_covers(variant, hlen):
        return None
    bands = _long1d_bands(nr, c, lp, rp, hlen,
                          n_bufs=10 if variant == "scratch" else 8,
                          max_body=max_body)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, c)
    out_spec = pl.BlockSpec((ib, 2 * c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, 2 * c), jnp.float32)
    if variant == "scratch":
        kern = functools.partial(_idwt1d_long_kernel_s, flo, fhi, lp,
                                 rp, c)
        scratch = [pltpu.VMEM((c + lp + rp, ib), jnp.float32)] * 2
    else:
        kern = functools.partial(_idwt1d_long_kernel, flo, fhi, lp, rp,
                                 c)
        scratch = []
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,),
        in_specs=[top, body, bot] * 2,
        out_specs=out_spec, out_shape=out_sds,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)
    return lambda a2, d2: call(a2, a2, a2, d2, d2, d2)


def idwt1d_long_fused(a, d, fb, n_out, rc):
    """One synthesis level of a long 1D pair via the folded-plane
    kernel; ``rc`` folds the coefficient length (n_out // 2)."""
    if a.ndim != 1 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    r, c = rc
    if n_out != 2 * r * c:
        return None
    lp, rp = conv.synthesis_pads(fb.hlen, c, 2 * c)
    f = _build_idwt1d_long(r, c, lp, rp, _taps(fb.rec_lo),
                           _taps(fb.rec_hi), _interpret(),
                           _long_variant(), _long_max_body())
    if f is None:
        return None
    return f(a.reshape(r, c), d.reshape(r, c)).reshape(-1)


def _swt1d_long_kernel(flo, fhi, lp, rp, s, factor, c,
                       top_ref, body_ref, bot_ref, lo_ref, hi_ref):
    tp = _fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
    lo, hi = _swt_sub(tp, flo, fhi, s, factor, lp, c)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


def _swt1d_long_kernel_s(flo, fhi, lp, rp, s, factor, c,
                         top_ref, body_ref, bot_ref, lo_ref, hi_ref,
                         tp_ref):
    tp_ref[:, :] = _fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
    lo, hi = _swt_sub_ref(tp_ref, flo, fhi, s, factor, lp, c)
    lo_ref[:, :] = lo.T
    hi_ref[:, :] = hi.T


@functools.lru_cache(maxsize=512)
def _build_swt1d_long(nr, c, level, flo, fhi, interpret,
                      variant="plain", max_body=512):
    hlen = len(flo)
    if not _long_variant_covers(variant, hlen, atrous=True):
        return None
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=False)
    bands = _long1d_bands(nr, c, lp, rp, hlen,
                          n_bufs=7 if variant == "scratch" else 6,
                          max_body=max_body)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, c)
    out_spec = pl.BlockSpec((ib, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c), jnp.float32)
    if variant == "scratch":
        kern = functools.partial(_swt1d_long_kernel_s, flo, fhi, lp, rp,
                                 s, factor, c)
        scratch = [pltpu.VMEM((c + lp + rp, ib), jnp.float32)]
    else:
        kern = functools.partial(_swt1d_long_kernel, flo, fhi, lp, rp,
                                 s, factor, c)
        scratch = []
    call = pl.pallas_call(
        kern, grid=(nr // ib,), in_specs=[top, body, bot],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)
    return (lambda x2: call(x2, x2, x2)), factor


def swt1d_long_fused(x, fb, level, rc):
    """One a-trous analysis level of a long 1D signal; None if
    uncovered (whole-row dilations run the jnp row-roll path, multi-row
    pads the jnp fold)."""
    if x.ndim != 1 or x.dtype != jnp.float32:
        return None
    r, c = rc
    if (1 << (level - 1)) % c == 0:
        return None  # row-roll fast path handles this better
    built = _build_swt1d_long(r, c, level, _taps(fb.dec_lo),
                              _taps(fb.dec_hi), _interpret(),
                              _long_variant("swt"), _long_max_body())
    if built is None:
        return None
    f, _ = built
    lo, hi = f(x.reshape(r, c))
    return lo.reshape(-1), hi.reshape(-1)


def _iswt1d_long_kernel(flo, fhi, lp, rp, s, factor, c, refs):
    a_top, a_body, a_bot, d_top, d_body, d_bot, out_ref = refs
    ap = _fold_pad(a_top, a_body, a_bot, lp, rp)
    dp = _fold_pad(d_top, d_body, d_bot, lp, rp)
    out_ref[:, :] = _swt_combine_sub(ap.T, dp.T, flo, fhi, s, factor,
                                     lp, c).T


def _iswt1d_long_kernel_s(flo, fhi, lp, rp, s, factor, c, refs):
    (a_top, a_body, a_bot, d_top, d_body, d_bot, out_ref,
     ap_ref, dp_ref) = refs
    ap_ref[:, :] = _fold_pad(a_top, a_body, a_bot, lp, rp).T
    dp_ref[:, :] = _fold_pad(d_top, d_body, d_bot, lp, rp).T
    out_ref[:, :] = _swt_combine_sub_ref(ap_ref, dp_ref, flo, fhi, s,
                                         factor, lp, c).T


@functools.lru_cache(maxsize=512)
def _build_iswt1d_long(nr, c, level, flo, fhi, interpret,
                       variant="plain", max_body=512):
    hlen = len(flo)
    if not _long_variant_covers(variant, hlen, atrous=True):
        return None
    lp, rp, s, factor = _swt_pads(hlen, level, inverse=True)
    bands = _long1d_bands(nr, c, lp, rp, hlen,
                          n_bufs=10 if variant == "scratch" else 8,
                          max_body=max_body)
    if bands is None:
        return None
    ib, hh = bands
    top, body, bot = _halo_specs(ib, hh, nr, c)
    out_spec = pl.BlockSpec((ib, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, c), jnp.float32)
    if variant == "scratch":
        kern = functools.partial(_iswt1d_long_kernel_s, flo, fhi, lp,
                                 rp, s, factor, c)
        scratch = [pltpu.VMEM((c + lp + rp, ib), jnp.float32)] * 2
    else:
        kern = functools.partial(_iswt1d_long_kernel, flo, fhi, lp, rp,
                                 s, factor, c)
        scratch = []
    call = pl.pallas_call(
        lambda *refs: kern(refs), grid=(nr // ib,),
        in_specs=[top, body, bot] * 2,
        out_specs=out_spec, out_shape=out_sds,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)
    return (lambda a2, d2: call(a2, a2, a2, d2, d2, d2)), factor


def iswt1d_long_fused(a, d, fb, level, rc):
    """One a-trous synthesis level of a long 1D pair; None if
    uncovered."""
    if a.ndim != 1 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    r, c = rc
    if (1 << (level - 1)) % c == 0:
        return None  # row-roll fast path handles this better
    built = _build_iswt1d_long(r, c, level, _taps(fb.rec_lo),
                               _taps(fb.rec_hi), _interpret(),
                               _long_variant("swt"), _long_max_body())
    if built is None:
        return None
    f, _ = built
    return f(a.reshape(r, c), d.reshape(r, c)).reshape(-1)
