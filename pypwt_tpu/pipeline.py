"""End-to-end denoising pipelines as single compiled executables.

The reference's denoising workflow (doc/denoising.rst) is a Python loop
of plan-method calls; here the whole pipeline — including cycle-spinning
averaging — compiles into one XLA program with no host round trips, with
randomness from explicit jax.random keys (the reference uses C rand(),
wt.cu:242-246).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .filters import get_filter_bank
from .core import dwt, haar, swt, thresh
from .core.shapes import clamp_levels, div2


def _fwd_inv(fb, levels, shape, do_swt):
    if fb.hlen == 2 and not do_swt:
        return (lambda x: haar.haar_wavedec2(x, levels),
                lambda c: haar.haar_waverec2(c, shape))
    if do_swt:
        return (lambda x: swt.swt2d(x, fb, levels),
                lambda c: swt.iswt2d(c, fb))
    return (lambda x: dwt.wavedec2(x, fb, levels),
            lambda c: dwt.waverec2(c, fb, shape))


@functools.partial(jax.jit, static_argnames=(
    "wname", "levels", "do_swt", "hard", "normalize",
    "threshold_appcoeffs"))
def denoise2d(img, wname, levels, beta, do_swt=False, hard=False,
              normalize=False, threshold_appcoeffs=False):
    """forward -> threshold -> inverse, one compiled step.

    Works on a single (Nr, Nc) image or a (B, Nr, Nc) stack.
    """
    fb = get_filter_bank(wname)
    levels = clamp_levels(levels, img.shape[-2:], fb.hlen, 2)
    fwd, inv = _fwd_inv(fb, levels, img.shape, do_swt)
    pyr = fwd(img)
    th = thresh.hard_threshold if hard else thresh.soft_threshold
    pyr = th(pyr, beta, bool(threshold_appcoeffs), bool(normalize))
    return inv(pyr)


@functools.partial(jax.jit, static_argnames=(
    "wname", "levels", "n_spins", "hard", "normalize",
    "threshold_appcoeffs", "shifts"))
def denoise2d_cycle_spinning(img, wname, levels, beta, key=None,
                             n_spins=8, hard=False, normalize=False,
                             threshold_appcoeffs=False, shifts=None):
    """Translation-invariant denoising by averaging over circular shifts
    (the reference's cycle spinning, wt.cu:242-246 and :303).

    Two modes:

    * ``shifts=((r0, c0), ...)`` — a STATIC tuple of shifts.  The spins
      unroll at trace time and the rolls compile to fused static slices
      (a dynamic 2D roll costs two full HBM round trips on TPU; static
      ones are nearly free).  Because an L-level periodized DWT is
      invariant to translations by multiples of 2^L, only shifts mod
      2^levels are distinct — the default diagonal schedule
      ``((0,0), (1,1), ..)`` already covers distinct cosets.
    * ``key=<jax.random key>`` — ``n_spins`` random shifts drawn on
      device (reproducible), run as a lax.scan.  Matches the
      reference's rand()-based behavior; ~2x slower per spin.
    """
    fb = get_filter_bank(wname)
    levels = clamp_levels(levels, img.shape[-2:], fb.hlen, 2)
    fwd, inv = _fwd_inv(fb, levels, img.shape, False)
    nr, nc = img.shape[-2], img.shape[-1]
    th = thresh.hard_threshold if hard else thresh.soft_threshold

    def spin(shifted):
        pyr = fwd(shifted)
        pyr = th(pyr, beta, bool(threshold_appcoeffs), bool(normalize))
        return inv(pyr)

    _sqrt2 = 2.0 ** 0.5
    _b1 = beta / _sqrt2 if normalize else beta  # finest-level beta

    def _fused_ok():
        return (dwt._pallas_enabled() and img.ndim == 2
                and img.dtype == jnp.float32 and fb.hlen != 2)

    def _sub_pyramid(a):
        """Shared spin body for the fused cycle-spin paths: decompose
        the level-1 approximation through levels 2..L, threshold the
        sub-pyramid (beta/sqrt2 keeps the global normalize schedule
        aligned with the level-0 in-kernel threshold), reconstruct back
        to the level-1 approximation plane."""
        details = []
        for _ in range(levels - 1):
            a, h, v, d = dwt.dwt2d(a, fb)
            details.append((h, v, d))
        sub = th([a] + details,
                 beta / _sqrt2 if normalize else beta,
                 bool(threshold_appcoeffs), bool(normalize))
        sizes = [img.shape[-2:]]
        for _ in range(levels):
            sizes.append((div2(sizes[-1][0]), div2(sizes[-1][1])))
        a = sub[0]
        for lev in range(levels - 1, 0, -1):
            hh, vv, dd = sub[lev]
            a = dwt.idwt2d(a, hh, vv, dd, fb, sizes[lev])
        return a

    def spin_static(sr, sc, acc, scale=1.0):
        """One spin with the static shift folded into the level-0
        kernels: the level-0 detail threshold runs in the analysis
        kernel's epilogue and the spin accumulator is fused into the
        unshifting synthesis store, so a spin costs one denoise's HBM
        traffic.  None if the kernels decline."""
        if not _fused_ok():
            return None  # haar/batched fall back to the roll path
        from .ops import pallas_dwt as pk
        mode = "hard" if hard else "soft"
        c0 = pk.dwt2d_fused_shifted(img, fb, sr, sc, thresh_mode=mode,
                                    beta=_b1)
        if c0 is None:
            return None
        a, h0, v0, d0 = c0
        a = _sub_pyramid(a)
        return pk.idwt2d_fused_unshift(a, h0, v0, d0, fb, img.shape,
                                       sr, sc, acc=acc, scale=scale)

    def spins_multishift():
        """All static spins through the multi-shift kernels: one image
        read for every spin's level-0 analysis, one store for the
        averaged reconstruction.  None if uncovered."""
        if not _fused_ok():
            return None
        from .ops import pallas_dwt as pk
        red = tuple((int(sr) % (1 << levels), int(sc) % (1 << levels))
                    for sr, sc in shifts)
        mode = "hard" if hard else "soft"
        c_all = pk.dwt2d_fused_multishift(img, fb, red, thresh_mode=mode,
                                          beta=_b1)
        if c_all is None:
            return None
        sets = [(_sub_pyramid(a), h0, v0, d0)
                for (a, h0, v0, d0) in c_all]
        return pk.idwt2d_fused_multiunshift(
            sets, fb, img.shape, red,
            scale=1.0 / len(shifts) if len(shifts) > 1 else 1.0)

    if shifts is not None:
        # The one-pass multi-spin kernels (all spins' level-0 analyses
        # from a single image read) save HBM reads but not VPU issue —
        # and the 2+3n/6+8n buffer footprint forces narrow bands, so
        # they measured SLOWER than the per-spin fused path (1084 vs
        # 951 us, 4 spins, 2048^2 db2 L3; doc/performance.md).  Kept
        # behind PYPWT_MULTISHIFT=1 as a measured experiment.
        if os.environ.get("PYPWT_MULTISHIFT", "0") == "1":
            out = spins_multishift()
            if out is not None:
                return out
        acc = None
        fell_back = False
        for k, (sr, sc) in enumerate(shifts):
            # an L-level periodized pyramid commutes with translations by
            # multiples of 2^L on both axes, so only shifts mod 2^levels
            # are distinct — the reduced shift rides the kernels' halo
            # blocks at zero extra HBM traffic; the last spin's store
            # also applies the 1/n averaging
            last = k == len(shifts) - 1
            new_acc = spin_static(int(sr) % (1 << levels),
                                  int(sc) % (1 << levels), acc,
                                  scale=(1.0 / len(shifts)
                                         if last and not fell_back
                                         and len(shifts) > 1 else 1.0))
            if new_acc is None:
                fell_back = True
                rec = spin(jnp.roll(img, (sr, sc), (-2, -1)))
                rec = jnp.roll(rec, (-sr, -sc), (-2, -1))
                acc = rec if acc is None else acc + rec
            else:
                acc = new_acc
        if fell_back or len(shifts) == 1:
            return acc / len(shifts) if len(shifts) > 1 else acc
        return acc

    if key is None:
        raise ValueError("pass either a random key or static shifts")

    def spin_dynamic(sr, sc, acc, scale=1.0):
        """One spin with a TRACED shift (already reduced mod 2^levels,
        which is exact): the shift factorizes through the pyramid as
        per-level PHASE BITS — A(roll(x, s)) = roll(A(roll(x, s%2)),
        s//2) — so every level is a 4-way lax.switch over the measured
        static-phase kernels and no dynamic data movement exists
        anywhere.  Detail planes live in residual-rolled coordinates
        (thresholding is pointwise, so this is invisible); the matching
        phase-synthesis switches reconstruct the exactly-unrolled
        image, with the spin accumulator and averaging scale fused into
        the level-0 store.  None if any phase kernel is uncovered."""
        if not _fused_ok():
            return None
        from .ops import pallas_dwt as pk
        mode = "hard" if hard else "soft"

        def phase_idx(l):
            return (((sr // (1 << l)) % 2) * 2
                    + ((sc // (1 << l)) % 2)).astype(jnp.int32)

        sizes = [img.shape[-2:]]
        planes = []
        a = img
        for l in range(levels):
            if l == 0:
                c = pk.dwt2d_fused_phase_switch(img, fb, phase_idx(0),
                                                thresh_mode=mode,
                                                beta=_b1)
            else:
                c = pk.dwt2d_fused_phase_switch(a, fb, phase_idx(l))
            if c is None:
                return None
            a, hh, vv, dd = c
            planes.append((hh, vv, dd))
            sizes.append((div2(sizes[-1][0]), div2(sizes[-1][1])))
        # threshold the level 2..L sub-pyramid (level-0 details were
        # thresholded in-kernel; beta/sqrt2 aligns the schedule)
        sub = th([a] + planes[1:],
                 beta / _sqrt2 if normalize else beta,
                 bool(threshold_appcoeffs), bool(normalize))
        a = sub[0]
        for l in range(levels - 1, 0, -1):
            hh, vv, dd = sub[l]
            a = pk.idwt2d_fused_phase_switch(a, hh, vv, dd, fb,
                                             sizes[l], phase_idx(l))
            if a is None:
                return None
        h0, v0, d0 = planes[0]
        return pk.idwt2d_fused_phase_switch(a, h0, v0, d0, fb,
                                            img.shape, phase_idx(0),
                                            acc=acc, scale=scale)

    keys = jax.random.split(key, n_spins)

    # fused path: spins unroll at trace time (n_spins is static) with
    # the traced shifts reduced mod 2^levels; matches the reference's
    # rand()-mode semantics bit-for-bit in distribution AND per key
    # (the reduction is exact, see spin_dynamic)
    def draw(k):
        sr = jax.random.randint(k, (), 0, nr) % (1 << levels)
        sc = jax.random.randint(jax.random.fold_in(k, 1), (),
                                0, nc) % (1 << levels)
        return sr, sc

    acc = None
    fused_ok = True
    for i in range(n_spins):
        sr, sc = draw(keys[i])
        last = i == n_spins - 1
        new_acc = spin_dynamic(sr, sc, acc,
                               scale=(1.0 / n_spins
                                      if last and n_spins > 1 else 1.0))
        if new_acc is None:
            fused_ok = False
            break
        acc = new_acc
    if fused_ok:
        return acc

    def one(carry, k):
        sr = jax.random.randint(k, (), 0, nr)
        sc = jax.random.randint(jax.random.fold_in(k, 1), (), 0, nc)
        shifted = jnp.roll(img, (sr, sc), (-2, -1))
        rec = jnp.roll(spin(shifted), (-sr, -sc), (-2, -1))
        return carry + rec, None

    acc, _ = jax.lax.scan(one, jnp.zeros_like(img), keys)
    return acc / n_spins
