"""Spatially-sharded transforms of single large images: rows are sharded
across chips and the row-pass filter support is satisfied by exchanging
halo rows over the ICI ring with ``ppermute``.

This is the distributed generalization of the reference kernels' in-thread
periodic indexing (separable.cu:112-121): the periodic wrap lands naturally
on the first<->last link of the ring, so a halo exchange on a ring mesh
*is* periodization.  Column passes stay local (each shard holds full rows).

Halo widths: DWT analysis needs (hlen-1-s, s-1) rows (conv.analysis_pads);
synthesis needs coefficient halos from conv.synthesis_pads; SWT dilates
both by 2^(level-1).  The local shard must be at least as tall as the halo
(enforced; deepen the mesh only as far as the shard height allows — the
same constraint SURVEY.md §7 flags for deep SWT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import conv
from .mesh import BATCH_AXIS, ROW_AXIS


def _ring_perms(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]  # data moves to the right
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def halo_exchange_last(x, lpad, rpad, axis_name, axis_size):
    """Periodic halo exchange along the last axis of a sharded-by-last-axis
    array: prepend the previous shard's last ``lpad`` samples and append
    the next shard's first ``rpad`` samples.

    With axis_size == 1 this degenerates to plain periodic padding.
    """
    if axis_size == 1:
        return conv.periodic_pad_last(x, lpad, rpad)
    n_local = x.shape[-1]
    if max(lpad, rpad) > n_local:
        raise ValueError(
            f"halo ({lpad},{rpad}) exceeds local shard size {n_local}; "
            "use fewer row-shards or fewer levels")
    fwd, bwd = _ring_perms(axis_size)
    parts = []
    if lpad:
        parts.append(jax.lax.ppermute(x[..., -lpad:], axis_name, fwd))
    parts.append(x)
    if rpad:
        parts.append(jax.lax.ppermute(x[..., :rpad], axis_name, bwd))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x


def _analysis_rows_sharded(x, fb, axis_name, axis_size):
    """Decimating analysis along axis -2 (rows) with halo exchange."""
    hlen = fb.dec_lo.shape[0] if hasattr(fb.dec_lo, "shape") else len(
        fb.dec_lo)
    xt = jnp.swapaxes(x, -1, -2)
    lpad, rpad = conv.analysis_pads(hlen)
    xp = halo_exchange_last(xt, lpad, rpad, axis_name, axis_size)
    L = xt.shape[-1] // 2
    lo, hi = conv.analysis_core(xp, fb.dec_lo, fb.dec_hi, L)
    return jnp.swapaxes(lo, -1, -2), jnp.swapaxes(hi, -1, -2)


def _synthesis_rows_sharded(lo, hi, fb, axis_name, axis_size):
    """Upsampling synthesis along axis -2 (rows) with halo exchange."""
    hlen = fb.rec_lo.shape[0] if hasattr(fb.rec_lo, "shape") else len(
        fb.rec_lo)
    lot = jnp.swapaxes(lo, -1, -2)
    hit = jnp.swapaxes(hi, -1, -2)
    L = lot.shape[-1]
    n_out = 2 * L
    lpad, rpad = conv.synthesis_pads(hlen, L, n_out)
    lop = halo_exchange_last(lot, lpad, rpad, axis_name, axis_size)
    hip = halo_exchange_last(hit, lpad, rpad, axis_name, axis_size)
    out = conv.synthesis_core(lop, hip, fb.rec_lo, fb.rec_hi, n_out, L,
                              lpad)
    return jnp.swapaxes(out, -1, -2)


def _local_wavedec2(x, fb, levels, axis_name, axis_size):
    a = x
    details = []
    for _ in range(levels):
        t1, t2 = conv.analysis_last(a, fb.dec_lo, fb.dec_hi)  # cols: local
        a, h = _analysis_rows_sharded(t1, fb, axis_name, axis_size)
        v, d = _analysis_rows_sharded(t2, fb, axis_name, axis_size)
        details.append((h, v, d))
    return [a] + details


def _local_waverec2(coeffs, fb, axis_name, axis_size):
    levels = len(coeffs) - 1
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        h, v, d = coeffs[lev]
        t1 = _synthesis_rows_sharded(a, h, fb, axis_name, axis_size)
        t2 = _synthesis_rows_sharded(v, d, fb, axis_name, axis_size)
        n_out = 2 * t1.shape[-1]
        a = conv.synthesis_last(t1, t2, fb.rec_lo, fb.rec_hi, n_out)
    return a


def _check_divisible(nr, nc, levels, n_rows):
    if nc % (1 << levels):
        raise ValueError(
            f"row length {nc} must be divisible by 2^levels for the "
            "row-sharded path")
    if nr % (n_rows << levels):
        raise ValueError(
            f"{nr} rows cannot be sharded over {n_rows} devices for "
            f"{levels} levels (need divisibility by {n_rows << levels})")


def wavedec2_rowsharded(image, fb, levels, mesh):
    """Multi-level separable 2D forward transform of an image whose rows
    are sharded over the mesh's row axis.  ``image`` may have a leading
    batch axis, sharded over the data axis.
    """
    nr, nc = image.shape[-2], image.shape[-1]
    n_rows = mesh.shape[ROW_AXIS]
    _check_divisible(nr, nc, levels, n_rows)
    batched = image.ndim == 3
    spec = (P(BATCH_AXIS, ROW_AXIS, None) if batched
            else P(ROW_AXIS, None))

    fn = shard_map(
        lambda x: _local_wavedec2(x, fb, levels, ROW_AXIS, n_rows),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(image)


def waverec2_rowsharded(coeffs, fb, mesh, batched=False):
    """Inverse of ``wavedec2_rowsharded``."""
    n_rows = mesh.shape[ROW_AXIS]
    spec = (P(BATCH_AXIS, ROW_AXIS, None) if batched
            else P(ROW_AXIS, None))
    fn = shard_map(
        lambda c: _local_waverec2(c, fb, ROW_AXIS, n_rows),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(coeffs)


# ---------------------------------------------------------------------------
# Stationary transform, row-sharded (halo = dilated filter support)
# ---------------------------------------------------------------------------

def _swt_rows_sharded(x, fb, level, axis_name, axis_size):
    hlen = fb.dec_lo.shape[0] if hasattr(fb.dec_lo, "shape") else len(
        fb.dec_lo)
    s = hlen // 2
    factor = 1 << (level - 1)
    xt = jnp.swapaxes(x, -1, -2)
    lpad, rpad = (hlen - 1 - s) * factor, s * factor
    xp = halo_exchange_last(xt, lpad, rpad, axis_name, axis_size)
    n = xt.shape[-1]
    flo = conv._as_taps(fb.dec_lo, x.dtype)
    fhi = conv._as_taps(fb.dec_hi, x.dtype)
    lo = None
    hi = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = xp[..., ofs: ofs + n]
        lo = seg * flo[k] if lo is None else lo + seg * flo[k]
        hi = seg * fhi[k] if hi is None else hi + seg * fhi[k]
    return jnp.swapaxes(lo, -1, -2), jnp.swapaxes(hi, -1, -2)


def _iswt_rows_sharded(lo, hi, fb, level, axis_name, axis_size):
    hlen = fb.rec_lo.shape[0] if hasattr(fb.rec_lo, "shape") else len(
        fb.rec_lo)
    s = hlen // 2 - 1 if hlen % 2 == 0 else hlen // 2
    factor = 1 << (level - 1)
    lot = jnp.swapaxes(lo, -1, -2)
    hit = jnp.swapaxes(hi, -1, -2)
    lpad, rpad = (hlen - 1 - s) * factor, max(s, 0) * factor
    lop = halo_exchange_last(lot, lpad, rpad, axis_name, axis_size)
    hip = halo_exchange_last(hit, lpad, rpad, axis_name, axis_size)
    n = lot.shape[-1]
    flo = conv._as_taps(fb.rec_lo, lo.dtype)
    fhi = conv._as_taps(fb.rec_hi, lo.dtype)
    half = jnp.asarray(0.5, lo.dtype)
    out = None
    for k in range(hlen):
        ofs = lpad + (s - k) * factor
        seg = (lop[..., ofs: ofs + n] * (flo[k] * half)
               + hip[..., ofs: ofs + n] * (fhi[k] * half))
        out = seg if out is None else out + seg
    return jnp.swapaxes(out, -1, -2)


def _local_swt2(x, fb, levels, axis_name, axis_size):
    a = x
    details = []
    for lev in range(1, levels + 1):
        t1, t2 = conv.swt_analysis_last(a, fb.dec_lo, fb.dec_hi, lev)
        a, h = _swt_rows_sharded(t1, fb, lev, axis_name, axis_size)
        v, d = _swt_rows_sharded(t2, fb, lev, axis_name, axis_size)
        details.append((h, v, d))
    return [a] + details


def _local_iswt2(coeffs, fb, axis_name, axis_size):
    levels = len(coeffs) - 1
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        h, v, d = coeffs[lev]
        t1 = _iswt_rows_sharded(a, h, fb, lev, axis_name, axis_size)
        t2 = _iswt_rows_sharded(v, d, fb, lev, axis_name, axis_size)
        a = conv.swt_synthesis_last(t1, t2, fb.rec_lo, fb.rec_hi, lev)
    return a


def swt2d_rowsharded(image, fb, levels, mesh):
    n_rows = mesh.shape[ROW_AXIS]
    batched = image.ndim == 3
    spec = (P(BATCH_AXIS, ROW_AXIS, None) if batched
            else P(ROW_AXIS, None))
    fn = shard_map(
        lambda x: _local_swt2(x, fb, levels, ROW_AXIS, n_rows),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(image)


def iswt2d_rowsharded(coeffs, fb, mesh, batched=False):
    n_rows = mesh.shape[ROW_AXIS]
    spec = (P(BATCH_AXIS, ROW_AXIS, None) if batched
            else P(ROW_AXIS, None))
    fn = shard_map(
        lambda c: _local_iswt2(c, fb, ROW_AXIS, n_rows),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(coeffs)


# ---------------------------------------------------------------------------
# Grid sharding: both image axes sharded (rows x cols mesh), halo exchange
# on both; and long-signal 1D sharding (the "sequence-parallel" analog:
# the sequence axis is the signal axis, SURVEY.md §5)
# ---------------------------------------------------------------------------

from .mesh import COL_AXIS  # noqa: E402


def _analysis_axis_sharded(x, fb, axis, axis_name, axis_size):
    """Decimating analysis along ``axis`` with periodic halo exchange."""
    hlen = len(fb.dec_lo)
    xt = x if axis in (-1, x.ndim - 1) else jnp.swapaxes(x, axis, -1)
    lpad, rpad = conv.analysis_pads(hlen)
    xp = halo_exchange_last(xt, lpad, rpad, axis_name, axis_size)
    lo, hi = conv.analysis_core(xp, fb.dec_lo, fb.dec_hi,
                                xt.shape[-1] // 2)
    if axis not in (-1, x.ndim - 1):
        lo = jnp.swapaxes(lo, axis, -1)
        hi = jnp.swapaxes(hi, axis, -1)
    return lo, hi


def _synthesis_axis_sharded(lo, hi, fb, axis, axis_name, axis_size):
    """Upsampling synthesis along ``axis`` with halo exchange."""
    hlen = len(fb.rec_lo)
    lot = lo if axis in (-1, lo.ndim - 1) else jnp.swapaxes(lo, axis, -1)
    hit = hi if axis in (-1, hi.ndim - 1) else jnp.swapaxes(hi, axis, -1)
    L = lot.shape[-1]
    n_out = 2 * L
    lpad, rpad = conv.synthesis_pads(hlen, L, n_out)
    lop = halo_exchange_last(lot, lpad, rpad, axis_name, axis_size)
    hip = halo_exchange_last(hit, lpad, rpad, axis_name, axis_size)
    out = conv.synthesis_core(lop, hip, fb.rec_lo, fb.rec_hi, n_out, L,
                              lpad)
    if axis not in (-1, lo.ndim - 1):
        out = jnp.swapaxes(out, axis, -1)
    return out


def _local_wavedec2_grid(x, fb, levels, n_rows, n_cols):
    a = x
    details = []
    for _ in range(levels):
        t1, t2 = _analysis_axis_sharded(a, fb, -1, COL_AXIS, n_cols)
        a, h = _analysis_axis_sharded(t1, fb, -2, ROW_AXIS, n_rows)
        v, d = _analysis_axis_sharded(t2, fb, -2, ROW_AXIS, n_rows)
        details.append((h, v, d))
    return [a] + details


def _local_waverec2_grid(coeffs, fb, n_rows, n_cols):
    levels = len(coeffs) - 1
    a = coeffs[0]
    for lev in range(levels, 0, -1):
        h, v, d = coeffs[lev]
        t1 = _synthesis_axis_sharded(a, h, fb, -2, ROW_AXIS, n_rows)
        t2 = _synthesis_axis_sharded(v, d, fb, -2, ROW_AXIS, n_rows)
        a = _synthesis_axis_sharded(t1, t2, fb, -1, COL_AXIS, n_cols)
    return a


def _check_grid(nr, nc, levels, n_rows, n_cols):
    if nr % (n_rows << levels) or nc % (n_cols << levels):
        raise ValueError(
            f"({nr}, {nc}) cannot be grid-sharded over ({n_rows}, "
            f"{n_cols}) chips for {levels} levels")


def wavedec2_gridsharded(image, fb, levels, mesh):
    """Multi-level separable 2D forward transform of an image sharded over
    a (rows, cols) mesh in BOTH spatial axes; halos ride ppermute on each
    ring, so arbitrarily large single images scale to a pod."""
    nr, nc = image.shape[-2], image.shape[-1]
    n_rows = mesh.shape[ROW_AXIS]
    n_cols = mesh.shape[COL_AXIS]
    _check_grid(nr, nc, levels, n_rows, n_cols)
    spec = P(ROW_AXIS, COL_AXIS)
    fn = shard_map(
        lambda x: _local_wavedec2_grid(x, fb, levels, n_rows, n_cols),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(image)


def waverec2_gridsharded(coeffs, fb, mesh):
    n_rows = mesh.shape[ROW_AXIS]
    n_cols = mesh.shape[COL_AXIS]
    spec = P(ROW_AXIS, COL_AXIS)
    fn = shard_map(
        lambda c: _local_waverec2_grid(c, fb, n_rows, n_cols),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(coeffs)


def wavedec1_seqsharded(x, fb, levels, mesh, axis_name=ROW_AXIS):
    """Multi-level 1D transform of signals whose LAST axis is sharded
    across chips — the long-signal ("sequence-parallel") configuration.
    Leading axes (if any) are local/batch."""
    n = x.shape[-1]
    n_shards = mesh.shape[axis_name]
    if n % (n_shards << levels):
        raise ValueError(
            f"signal length {n} cannot be sharded over {n_shards} chips "
            f"for {levels} levels")
    spec = P(*([None] * (x.ndim - 1)), axis_name)

    def local(xl):
        a = xl
        details = []
        for _ in range(levels):
            a, dd = _analysis_axis_sharded(a, fb, -1, axis_name, n_shards)
            details.append(dd)
        return [a] + details

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(x)


def waverec1_seqsharded(coeffs, fb, mesh, axis_name=ROW_AXIS):
    """Inverse of ``wavedec1_seqsharded``."""
    n_shards = mesh.shape[axis_name]
    ndim = coeffs[0].ndim
    spec = P(*([None] * (ndim - 1)), axis_name)

    def local(c):
        levels = len(c) - 1
        a = c[0]
        for lev in range(levels, 0, -1):
            a = _synthesis_axis_sharded(a, c[lev], fb, -1, axis_name,
                                        n_shards)
        return a

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)(coeffs)
