"""Fused separable 2D DWT level kernels on the MXU (Pallas / Mosaic-TPU).

The VPU tap-loop kernels (ops/pallas_dwt.py) pay one VMEM traversal per
filter tap, so wide wavelets scale linearly in hlen (sym8 measured 2.65x
db2 for identical memory traffic).  Here each separable pass runs as a
sequence of banded MXU matmuls instead: a block of ``b`` output rows of
(lo, hi) is one fp32 dot ``D (2b, K) @ xp_slice (K, W)`` with
``K = 2b + hlen - 2`` chosen to fill exactly one 128-wide MXU pass.  The
cost per output element is ~128 MACs regardless of hlen, which makes the
kernels tap-count-independent: measured on TPU v5e, level-0 analysis at
2048^2 runs ~104 us for BOTH db2 and sym8 (VPU: 103 / 274 us).

Precision: Mosaic supports DEFAULT (bf16, one pass) and HIGHEST (six
passes, ~fp32) dot precision only.  DEFAULT fails the reference accuracy
envelope (measured 2.5 abs err on 255-scale data) and even a 4-term
bf16-split scheme only carries ~17 mantissa bits (4.3e-3 abs err), so
these kernels default to HIGHEST (measured err ~1e-4 at 2048^2, within
the 3e-4 * 2^level envelope).  core.dwt.set_mxu_precision("bf16")
opts into single-pass DEFAULT dots (~6x MXU rate, ~1% RMS error,
up to ~3.5% worst-pixel — measured over all 67 MXU banks on v5e)
for throughput-first workloads; builders key their lru caches on the
knob so both modes coexist.

The banded matrices are built in float64 numpy straight from the
reference index algebra (separable.cu:91-176 analysis / :246-328
polyphase synthesis, identical to pypwt_tpu.core.conv) and verified
against conv in tests/test_mxu.py.  Only even hlen and float32 are
handled; callers fall back to the VPU kernels / jnp path.
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

HIGHEST = jax.lax.Precision.HIGHEST

_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 30 * 1024 * 1024


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
# Banded block matrices (float64 numpy, cast to f32 kernel constants)
# ---------------------------------------------------------------------------

def analysis_matrix(dec_lo, dec_hi, b):
    """D (2b, K), K = 2b + hlen - 2: rows [lo_b; hi_b] of the decimating
    analysis map out[i] = sum_j f[hlen-1-j] xp[2i+j] (conv.analysis_core /
    separable.cu:91-131)."""
    flo = np.asarray(dec_lo, np.float64)
    fhi = np.asarray(dec_hi, np.float64)
    hlen = len(flo)
    K = 2 * b + hlen - 2
    D = np.zeros((2 * b, K), np.float64)
    for i in range(b):
        for j in range(hlen):
            D[i, 2 * i + j] += flo[hlen - 1 - j]
            D[b + i, 2 * i + j] += fhi[hlen - 1 - j]
    return np.ascontiguousarray(D, np.float32), K


def synthesis_matrix(rec_lo, rec_hi, m):
    """S (2m, 2*Kp), Kp = m + hlen//2: the polyphase synthesis map from
    stacked [lop_slice; hip_slice] to 2m interleaved outputs
    (conv.synthesis_core / separable.cu:246-328).  Input slices start at
    coefficient q0 of planes padded with lpad = c on the left."""
    flo = np.asarray(rec_lo, np.float64)
    fhi = np.asarray(rec_hi, np.float64)
    hlen = len(flo)
    h2 = hlen // 2
    sigma = 1 if h2 % 2 == 0 else 0
    # slice indices r = delta + j + q reach m + h2 - 2 + max(delta), and
    # max(delta) = sigma (conv.synthesis_core phase rules)
    Kp = m + h2 - 1 + sigma
    S = np.zeros((2 * m, 2 * Kp), np.float64)
    for p in (0, 1):
        pp = (p + sigma) & 1
        delta = (p + sigma) >> 1
        off = 1 - pp
        for q in range(m):
            for j in range(h2):
                tap = hlen - 1 - 2 * j - off
                r = delta + j + q
                S[2 * q + p, r] += flo[tap]
                S[2 * q + p, Kp + r] += fhi[tap]
    return np.ascontiguousarray(S, np.float32), Kp


def _ana_blocks(hlen):
    """Full-block size b with K = 2b + hlen - 2 = 128 (one MXU K-tile)."""
    return (130 - hlen) // 2


def _syn_blocks(hlen):
    """Full-block size m with 2*Kp <= 128 (one MXU K-tile when the two
    plane slices are stacked)."""
    h2 = hlen // 2
    sigma = 1 if h2 % 2 == 0 else 0
    return 64 - (h2 - 1 + sigma)


# ---------------------------------------------------------------------------
# In-kernel banded-dot passes (sublane axis)
# ---------------------------------------------------------------------------

def _ana_dots(xp, Dm, Dr, b, K, L):
    """Banded analysis on padded xp (P, W) -> lo, hi (L, W) each."""
    los, his = [], []
    nfull = L // b
    for k in range(nfull):
        y = _dot(Dm, xp[2 * b * k: 2 * b * k + K, :])
        los.append(y[:b, :])
        his.append(y[b:, :])
    r = L - nfull * b
    if r:
        Kr = Dr.shape[1]
        y = _dot(Dr, xp[2 * b * nfull: 2 * b * nfull + Kr, :])
        los.append(y[:r, :])
        his.append(y[r:, :])
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    return lo, hi


def _syn_dots(lop, hip, Sm, Sr, m, Kp, L):
    """Banded polyphase synthesis of padded planes (P, W) -> (2L, W).
    ``L`` is the unpadded coefficient length; lop/hip carry lpad = c on
    the left and >= hlen//2 - c on the right."""
    outs = []
    nfull = L // m
    for k in range(nfull):
        z = jnp.concatenate([lop[m * k: m * k + Kp, :],
                             hip[m * k: m * k + Kp, :]], axis=0)
        outs.append(_dot(Sm, z))
    r = L - nfull * m
    if r:
        Kr = Sr.shape[1] // 2
        z = jnp.concatenate([lop[m * nfull: m * nfull + Kr, :],
                             hip[m * nfull: m * nfull + Kr, :]], axis=0)
        outs.append(_dot(Sr, z))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# Fused analysis level
# ---------------------------------------------------------------------------

def _covers(fb, nr, nc):
    return fb.hlen % 2 == 0 and nr % 2 == 0 and nc % 2 == 0


def _pick_ib(nr, nc, halo, n_bufs, max_body=512):
    """Band rows for the grid: divides nr, halo-block compatible, fits the
    VMEM budget."""
    hh = None
    for cand in (8, 16, 32):
        if cand >= max(halo, 1) and nr % cand == 0:
            hh = cand
            break
    out = None
    if hh is not None:
        for ib in (256, 512, 128, 64, 32, 16, 8):
            if ib > max_body or nr % ib or ib % hh:
                continue
            if (ib + 2 * hh) * nc * 4 * n_bufs <= _VMEM_BUDGET:
                out = (ib, hh)
                break
    pk.BAND_CHOICES[("mxu", nr, nc, halo, n_bufs, max_body)] = out
    return out


@functools.lru_cache(maxsize=512)
def _build_dwt2d_mxu(nr, nc, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if hlen % 2 or hlen < 4:
        return None
    lp, rp = conv.analysis_pads(hlen)
    picked = _pick_ib(nr, nc, max(lp, rp), n_bufs=8)
    if picked is None:
        return None
    ib, hh = picked
    b = _ana_blocks(hlen)
    if b < 1 or ib // 2 < b // 2:
        return None
    L_row, L_col = ib // 2, nc // 2

    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    rems = []
    for L in (L_row, L_col):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(analysis_matrix(flo, fhi, r)[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
    n_mats = len(mats)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        top_ref, body_ref, bot_ref = refs[n_mats:n_mats + 3]
        a_ref, h_ref, v_ref, d_ref = refs[n_mats + 3:]
        Dr_row = ms[rems[0]] if rems[0] is not None else None
        Dr_col = ms[rems[1]] if rems[1] is not None else None

        rows = pk._gather_rows(top_ref, body_ref, bot_ref, lp, rp)
        lo, hi = _ana_dots(rows, ms[0], Dr_row, b, K, L_row)

        def cols(t):
            tp = pk._pad_lanes_T(t, lp, rp)
            l2, h2_ = _ana_dots(tp, ms[0], Dr_col, b, K, L_col)
            return l2.T, h2_.T

        a, v = cols(lo)
        h, d = cols(hi)
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

    # keep numpy (NOT jnp) constants: the builder is lru_cached and may
    # first run inside a jit trace — a jnp array created there would be a
    # tracer captured across traces (UnexpectedTracerError on reuse)
    mats_j = [np.asarray(m) for m in mats]

    def fused(x):
        return call(*mats_j, x, x, x)

    return fused


def dwt2d_fused_mxu(x, fb):
    """One fused separable analysis level on the MXU; None if uncovered."""
    if x.ndim not in (2, 3) or x.dtype != jnp.float32:
        return None
    nr, nc = x.shape[-2], x.shape[-1]
    if not _covers(fb, nr, nc):
        return None
    f = _build_dwt2d_mxu(nr, nc, pk._taps(fb.dec_lo), pk._taps(fb.dec_hi),
                         pk._interpret(), _prec())
    if f is None:
        return None
    if x.ndim == 3:
        return tuple(jax.vmap(f)(x))
    return tuple(f(x))


# ---------------------------------------------------------------------------
# Fused synthesis level
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_idwt2d_mxu(nr_out, nc_out, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    m = _syn_blocks(hlen)
    if m < 1:
        return None
    picked = _pick_ib(lrows, w, max(lp, rp), n_bufs=18, max_body=128)
    if picked is None:
        return None
    tcb, hh = picked
    L_row, L_col = tcb, w

    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    rems = []
    for L in (L_row, L_col):
        r = L - (L // m) * m
        if r:
            rems.append(len(mats))
            mats.append(synthesis_matrix(flo, fhi, r)[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(tcb, hh, lrows, w)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
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

        # row-axis polyphase synthesis (reference pass1)
        t1 = _syn_dots(ar, hr, ms[0], Sr_row, m, Kp, L_row)
        t2 = _syn_dots(vr, dr, ms[0], Sr_row, m, Kp, L_row)

        # column-axis synthesis on the transposed planes (pass2)
        lop = pk._pad_lanes_T(t1, lpc, rpc)
        hip = pk._pad_lanes_T(t2, lpc, rpc)
        out_ref[:, :] = _syn_dots(lop, hip, ms[0], Sr_col, m, Kp, L_col).T

    call = pl.pallas_call(
        kern, grid=(lrows // tcb,),
        in_specs=[d_spec] * n_mats + [top, body, bot] * 4,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp: see above

    def fused(a, h, v, d):
        return call(*mats_j, a, a, a, h, h, h, v, v, v, d, d, d)

    return fused


def idwt2d_fused_mxu(a, h, v, d, fb, out_shape):
    """One fused separable synthesis level on the MXU; None if uncovered."""
    nr, nc = out_shape[-2], out_shape[-1]
    if a.dtype != jnp.float32 or a.ndim not in (2, 3):
        return None
    if (nr, nc) != (2 * a.shape[-2], 2 * a.shape[-1]):
        return None
    if not (a.shape == h.shape == v.shape == d.shape):
        return None
    f = _build_idwt2d_mxu(nr, nc, pk._taps(fb.rec_lo), pk._taps(fb.rec_hi),
                          pk._interpret(), _prec())
    if f is None:
        return None
    if a.ndim == 3:
        return jax.vmap(f)(a, h, v, d)
    return f(a, h, v, d)


# ---------------------------------------------------------------------------
# Fused batched-1D levels (lane-axis transform via transposed dots)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_dwt1d_mxu(nr, nc, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or nc % 2:
        return None
    lp, rp = conv.analysis_pads(hlen)
    picked = _pick_ib(nr, nc, 0, n_bufs=8)
    if picked is None:
        return None
    ib, _ = picked
    b = _ana_blocks(hlen)
    L = nc // 2
    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    r = L - (L // b) * b
    if r:
        mats.append(analysis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    body = pl.BlockSpec((ib, nc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, nc // 2), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        body_ref = refs[n_mats]
        lo_ref, hi_ref = refs[n_mats + 1:]
        Dr = ms[1] if n_mats > 1 else None
        tp = pk._pad_lanes_T(body_ref[:, :], lp, rp)
        lo, hi = _ana_dots(tp, ms[0], Dr, b, K, L)
        lo_ref[:, :] = lo.T
        hi_ref[:, :] = hi.T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp: see above
    return lambda x: call(*mats_j, x)


def dwt1d_fused_mxu(x, fb):
    """One fused batched-1D analysis level on the MXU; None if uncovered."""
    if x.ndim != 2 or x.dtype != jnp.float32:
        return None
    f = _build_dwt1d_mxu(x.shape[0], x.shape[1], pk._taps(fb.dec_lo),
                         pk._taps(fb.dec_hi), pk._interpret(), _prec())
    if f is None:
        return None
    return tuple(f(x))


@functools.lru_cache(maxsize=512)
def _build_idwt1d_mxu(nr, L, n_out, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or n_out != 2 * L:
        return None
    lp, rp = conv.synthesis_pads(hlen, L, n_out)
    m = _syn_blocks(hlen)
    picked = _pick_ib(nr, n_out, 0, n_bufs=10)
    if picked is None:
        return None
    ib, _ = picked
    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    r = L - (L // m) * m
    if r:
        mats.append(synthesis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ib, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, n_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, n_out), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        a_ref, d_ref, out_ref = refs[n_mats:]
        Sr = ms[1] if n_mats > 1 else None
        lop = pk._pad_lanes_T(a_ref[:, :], lp, rp)
        hip = pk._pad_lanes_T(d_ref[:, :], lp, rp)
        out_ref[:, :] = _syn_dots(lop, hip, ms[0], Sr, m, Kp, L).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp: see above
    return lambda a, d: call(*mats_j, a, d)


def idwt1d_fused_mxu(a, d, fb, n_out):
    """One fused batched-1D synthesis level on the MXU; None if
    uncovered."""
    if a.ndim != 2 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    f = _build_idwt1d_mxu(a.shape[0], a.shape[1], n_out,
                          pk._taps(fb.rec_lo), pk._taps(fb.rec_hi),
                          pk._interpret(), _prec())
    if f is None:
        return None
    return f(a, d)


# ---------------------------------------------------------------------------
# Sharded level kernels (ppermute edge halos; parallel/spatial.py).
# Same banded-dot bodies as the unsharded builders, with the first/last
# grid programs' wrapped halo blocks overridden by exchanged neighbor
# rows — the MXU twin of pallas_dwt.build_dwt2d_sharded.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def build_dwt2d_sharded_mxu(nr, nc, flo, fhi, interpret, prec="highest"):
    """(fused_fn, halo_rows) for one sharded analysis level on the MXU,
    or None.  fused_fn(x, ext_top, ext_bot) -> (a, h, v, d)."""
    hlen = len(flo)
    if hlen % 2 or hlen < 4:
        return None
    lp, rp = conv.analysis_pads(hlen)
    bands = pk._pick_bands(nr, nc, lp, rp, n_bufs=8, max_body=1024,
                           budget=52 * 1024 * 1024)
    if bands is None:
        return None
    ib, hh = bands
    b = _ana_blocks(hlen)
    if b < 1:
        return None
    L_row, L_col = ib // 2, nc // 2

    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    rems = []
    for L in (L_row, L_col):
        r = L - (L // b) * b
        if r:
            rems.append(len(mats))
            mats.append(analysis_matrix(flo, fhi, r)[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(ib, hh, nr, nc)
    ext = pl.BlockSpec((hh, nc), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib // 2, nc // 2), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr // 2, nc // 2), jnp.float32)
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
        lo, hi = _ana_dots(rows, ms[0], Dr_row, b, K, L_row)

        def cols(t):
            tp = pk._pad_lanes_T(t, lp, rp)
            l2, h2_ = _ana_dots(tp, ms[0], Dr_col, b, K, L_col)
            return l2.T, h2_.T

        a, v = cols(lo)
        h, d = cols(hi)
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
def build_idwt2d_sharded_mxu(nr_out, nc_out, flo, fhi, interpret, prec="highest"):
    """(fused_fn, halo_rows) for one sharded synthesis level on the MXU,
    or None.  fused_fn(a, h, v, d, (a_t, a_b, ..., d_b)) -> image."""
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or nr_out % 2 or nc_out % 2:
        return None
    lrows = nr_out // 2
    w = nc_out // 2
    lp, rp = conv.synthesis_pads(hlen, lrows, nr_out)
    lpc, rpc = conv.synthesis_pads(hlen, w, nc_out)
    m = _syn_blocks(hlen)
    if m < 1:
        return None
    bands = pk._pick_bands(lrows, w, lp, rp, n_bufs=18, max_body=128)
    if bands is None:
        return None
    tcb, hh = bands
    L_row, L_col = tcb, w

    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    rems = []
    for L in (L_row, L_col):
        r = L - (L // m) * m
        if r:
            rems.append(len(mats))
            mats.append(synthesis_matrix(flo, fhi, r)[0])
        else:
            rems.append(None)

    top, body, bot = pk._halo_specs(tcb, hh, lrows, w)
    ext = pl.BlockSpec((hh, w), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * tcb, nc_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr_out, nc_out), jnp.float32)
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
            t, bd, bo = blocks[3 * j: 3 * j + 3]
            et, eb = exts[2 * j: 2 * j + 2]
            tb, bb = pk._edge_override(t, bo, et, eb)
            planes.append(pk._gather_rows(tb, bd, bb, lp, rp))
        ar, hr, vr, dr = planes

        t1 = _syn_dots(ar, hr, ms[0], Sr_row, m, Kp, L_row)
        t2 = _syn_dots(vr, dr, ms[0], Sr_row, m, Kp, L_row)

        lop = pk._pad_lanes_T(t1, lpc, rpc)
        hip = pk._pad_lanes_T(t2, lpc, rpc)
        out_ref[:, :] = _syn_dots(lop, hip, ms[0], Sr_col, m, Kp,
                                  L_col).T

    call = pl.pallas_call(
        kern, grid=(lrows // tcb,),
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
# Padded-core kernels: banded dots over ALREADY-PADDED arrays (the MXU
# twins of pallas_dwt.build_{ana,syn}_padded_{lanes,rows}; used by the
# grid-sharded and seq-sharded paths after halo exchange).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def build_ana_padded_lanes_mxu(nr, ncp, L, flo, fhi, interpret, prec="highest"):
    """Decimating analysis along the last axis of an (nr, ncp) padded
    array -> two (nr, L) outputs; None if uncovered."""
    hlen = len(flo)
    # the analysis matrix consumes slices of a plane padded by exactly
    # hlen - 2 (conv.analysis_pads); other paddings fall back
    if hlen % 2 or hlen < 4 or ncp != 2 * L + hlen - 2:
        return None
    bands = pk._pick_bands(nr, ncp, 0, 0, n_bufs=8)
    if bands is None:
        return None
    ib, _ = bands
    b = _ana_blocks(hlen)
    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    r = L - (L // b) * b
    if r:
        mats.append(analysis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    body = pl.BlockSpec((ib, ncp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, L), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        body_ref = refs[n_mats]
        lo_ref, hi_ref = refs[n_mats + 1:]
        Dr = ms[1] if n_mats > 1 else None
        lo, hi = _ana_dots(body_ref[:, :].T, ms[0], Dr, b, K, L)
        lo_ref[:, :] = lo.T
        hi_ref[:, :] = hi.T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp
    return lambda x: call(*mats_j, x)


@functools.lru_cache(maxsize=512)
def build_ana_padded_rows_mxu(nrp, nc, L, flo, fhi, interpret, prec="highest"):
    """Decimating analysis along the ROW axis of an (nrp, nc) padded
    array -> two (L, nc) outputs (no transposes anywhere)."""
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or nrp != 2 * L + hlen - 2:
        return None
    cb = None
    for cand in (512, 256, 128):
        if nc % cand == 0 and nrp * cand * 4 * 8 <= _VMEM_BUDGET:
            cb = cand
            break
    if cb is None:
        return None
    b = _ana_blocks(hlen)
    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    r = L - (L // b) * b
    if r:
        mats.append(analysis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    body = pl.BlockSpec((nrp, cb), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((L, nc), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        body_ref = refs[n_mats]
        lo_ref, hi_ref = refs[n_mats + 1:]
        Dr = ms[1] if n_mats > 1 else None
        lo, hi = _ana_dots(body_ref[:, :], ms[0], Dr, b, K, L)
        lo_ref[:, :] = lo
        hi_ref[:, :] = hi

    call = pl.pallas_call(
        kern, grid=(nc // cb,),
        in_specs=[d_spec] * n_mats + [body],
        out_specs=[out_spec] * 2, out_shape=[out_sds] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(m) for m in mats]  # numpy, not jnp
    return lambda x: call(*mats_j, x)


def _syn_padded_cover(hlen, Lp, L, n_out, lpad):
    """The synthesis matrix reads slices of planes padded with exactly
    lpad = c on the left and h2 - 1 + sigma - c on the right."""
    h2 = hlen // 2
    sigma = 1 if h2 % 2 == 0 else 0
    c = h2 // 2
    return (hlen % 2 == 0 and hlen >= 4 and n_out == 2 * L
            and lpad == c and Lp == L + h2 - 1 + sigma)


@functools.lru_cache(maxsize=512)
def build_syn_padded_lanes_mxu(nr, Lp, n_out, lpad, flo, fhi, interpret, prec="highest"):
    """Polyphase synthesis along the last axis of two (nr, Lp) padded
    coefficient arrays -> (nr, n_out); None if uncovered."""
    hlen = len(flo)
    L = n_out // 2
    if not _syn_padded_cover(hlen, Lp, L, n_out, lpad):
        return None
    m = _syn_blocks(hlen)
    if m < 1:
        return None
    bands = pk._pick_bands(nr, max(Lp, n_out), 0, 0, n_bufs=10)
    if bands is None:
        return None
    ib, _ = bands
    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    r = L - (L // m) * m
    if r:
        mats.append(synthesis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ib, Lp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, n_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, n_out), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        a_ref, d_ref, out_ref = refs[n_mats:]
        Sr = ms[1] if n_mats > 1 else None
        out_ref[:, :] = _syn_dots(a_ref[:, :].T, d_ref[:, :].T, ms[0],
                                  Sr, m, Kp, L).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp
    return lambda a, d: call(*mats_j, a, d)


@functools.lru_cache(maxsize=512)
def build_syn_padded_rows_mxu(Lp, nc, n_out, lpad, flo, fhi, interpret, prec="highest"):
    """Polyphase synthesis along the ROW axis of two (Lp, nc) padded
    coefficient arrays -> (n_out, nc)."""
    hlen = len(flo)
    L = n_out // 2
    if not _syn_padded_cover(hlen, Lp, L, n_out, lpad):
        return None
    m = _syn_blocks(hlen)
    if m < 1:
        return None
    cb = None
    for cand in (512, 256, 128):
        if nc % cand == 0 and max(Lp, n_out) * cand * 4 * 10 \
                <= _VMEM_BUDGET:
            cb = cand
            break
    if cb is None:
        return None
    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    r = L - (L // m) * m
    if r:
        mats.append(synthesis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((Lp, cb), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_out, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_out, nc), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        a_ref, d_ref, out_ref = refs[n_mats:]
        Sr = ms[1] if n_mats > 1 else None
        out_ref[:, :] = _syn_dots(a_ref[:, :], d_ref[:, :], ms[0], Sr,
                                  m, Kp, L)

    call = pl.pallas_call(
        kern, grid=(nc // cb,),
        in_specs=[d_spec] * n_mats + [in_spec, in_spec],
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp
    return lambda a, d: call(*mats_j, a, d)


# ---------------------------------------------------------------------------
# Folded long-1D kernels (single long signal reshaped to (rows, c) with
# in-kernel inter-row halos — pallas_dwt._fold_pad).  The banded-dot
# bodies have no per-tap temporaries, so they dodge the wide-filter x
# narrow-fold VMEM blowup that makes the VPU builders decline
# (pallas_dwt._long1d_bands).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def _build_dwt1d_long_mxu(nr, c, lp, rp, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if hlen % 2 or hlen < 4 or c % 2 or (c + lp + rp) % 2:
        return None
    if max(lp, rp) > c:
        return None  # multi-row pads: jnp fold path
    bands = pk._pick_bands(nr, c, 1, 1, n_bufs=8)
    if bands is None:
        return None
    ib, hh = bands
    b = _ana_blocks(hlen)
    L = c // 2
    Dm, K = analysis_matrix(flo, fhi, b)
    mats = [Dm]
    r = L - (L // b) * b
    if r:
        mats.append(analysis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    top, body, bot = pk._halo_specs(ib, hh, nr, c)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, L), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        top_ref, body_ref, bot_ref = refs[n_mats:n_mats + 3]
        lo_ref, hi_ref = refs[n_mats + 3:]
        Dr = ms[1] if n_mats > 1 else None
        tp = pk._fold_pad(top_ref, body_ref, bot_ref, lp, rp).T
        lo, hi = _ana_dots(tp, ms[0], Dr, b, K, L)
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
    return lambda x2: call(*mats_j, x2, x2, x2)


def dwt1d_long_fused_mxu(x, fb, rc):
    """One analysis level of a long 1D signal via banded MXU dots on the
    folded plane; None if uncovered."""
    if x.ndim != 1 or x.dtype != jnp.float32:
        return None
    r, c = rc
    lp, rp = conv.analysis_pads(fb.hlen)
    f = _build_dwt1d_long_mxu(r, c, lp, rp, pk._taps(fb.dec_lo),
                              pk._taps(fb.dec_hi), pk._interpret(), _prec())
    if f is None:
        return None
    lo, hi = f(x.reshape(r, c))
    return lo.reshape(-1), hi.reshape(-1)


@functools.lru_cache(maxsize=512)
def _build_idwt1d_long_mxu(nr, c, lp, rp, flo, fhi, interpret, prec="highest"):
    hlen = len(flo)
    if not _syn_padded_cover(hlen, c + lp + rp, c, 2 * c, lp):
        return None
    if max(lp, rp) > c:
        return None
    m = _syn_blocks(hlen)
    if m < 1:
        return None
    bands = pk._pick_bands(nr, 2 * c, 1, 1, n_bufs=10)
    if bands is None:
        return None
    ib, hh = bands
    Sm, Kp = synthesis_matrix(flo, fhi, m)
    mats = [Sm]
    r = c - (c // m) * m
    if r:
        mats.append(synthesis_matrix(flo, fhi, r)[0])
    n_mats = len(mats)

    top, body, bot = pk._halo_specs(ib, hh, nr, c)
    d_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ib, 2 * c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nr, 2 * c), jnp.float32)

    def kern(*refs):
        ms = [refs[i][:, :] for i in range(n_mats)]
        (a_top, a_body, a_bot, d_top, d_body, d_bot) = \
            refs[n_mats:n_mats + 6]
        out_ref = refs[n_mats + 6]
        Sr = ms[1] if n_mats > 1 else None
        ap = pk._fold_pad(a_top, a_body, a_bot, lp, rp).T
        dp = pk._fold_pad(d_top, d_body, d_bot, lp, rp).T
        out_ref[:, :] = _syn_dots(ap, dp, ms[0], Sr, m, Kp, c).T

    call = pl.pallas_call(
        kern, grid=(nr // ib,),
        in_specs=[d_spec] * n_mats + [top, body, bot] * 2,
        out_specs=out_spec, out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret)

    mats_j = [np.asarray(mm) for mm in mats]  # numpy, not jnp
    return lambda a2, d2: call(*mats_j, a2, a2, a2, d2, d2, d2)


def idwt1d_long_fused_mxu(a, d, fb, n_out, rc):
    """One synthesis level of a long 1D pair via banded MXU dots on the
    folded planes; None if uncovered."""
    if a.ndim != 1 or a.dtype != jnp.float32 or a.shape != d.shape:
        return None
    r, c = rc
    if n_out != 2 * r * c:
        return None
    lp, rp = conv.synthesis_pads(fb.hlen, c, 2 * c)
    f = _build_idwt1d_long_mxu(r, c, lp, rp, pk._taps(fb.rec_lo),
                               pk._taps(fb.rec_hi), pk._interpret(), _prec())
    if f is None:
        return None
    return f(a.reshape(r, c), d.reshape(r, c)).reshape(-1)
