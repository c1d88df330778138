"""Scalar NumPy oracle encoding the reference kernels' observable behavior.

Slow, loop-based, float64 — used only by tests as the differential oracle
(the role pywt played for the reference, cf. test/test_wavelets.py).  The
index rules restate the reference kernels:

* forward separable pass: separable.cu:91-131 (odd sizes virtually extended
  by repeating the last element)
* inverse separable pass: separable.cu:246-328 (even half-length centered
  right, per-parity filter phases)
* SWT passes: separable.cu:409-493 and 553-626 (a-trous, mod-N wrap,
  inverse scaled by 1/2 per axis)
"""

from __future__ import annotations

import numpy as np


def ref_analysis_1d(x, f):
    """out[i] = sum_j x_ext[2i - c + j] * f[hlen-1-j], periodized."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    hlen = len(f)
    odd = n % 2
    m = n + odd
    c = hlen // 2 if hlen % 2 else hlen // 2 - 1
    L = m // 2
    out = np.zeros(L)
    for i in range(L):
        acc = 0.0
        for j in range(hlen):
            idx = 2 * i - c + j
            idx %= m
            if odd and idx == n:
                idx = n - 1
            acc += x[idx] * f[hlen - 1 - j]
        out[i] = acc
    return out


def ref_synthesis_1d(lo, hi, fl, fh, n_out):
    """Reference inverse pass (separable.cu:293-328) on one axis."""
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    L = len(lo)
    hlen = len(fl)
    hlen2 = hlen // 2
    if hlen2 % 2 == 1:
        c = hlen2 // 2
        shift = 0
    else:
        c = hlen2 // 2
        shift = 1
    out = np.zeros(n_out)
    for g0 in range(n_out):
        g = g0 + shift
        off = 1 - (g & 1)
        acc = 0.0
        for j in range(hlen2):
            idx = (g // 2 - c + j) % L
            acc += lo[idx] * fl[hlen - 1 - (2 * j + off)]
            acc += hi[idx] * fh[hlen - 1 - (2 * j + off)]
        out[g0] = acc
    return out


def ref_swt_analysis_1d(x, f, level):
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    hlen = len(f)
    factor = 1 << (level - 1)
    c = (hlen // 2 if hlen % 2 else hlen // 2 - 1) * factor
    out = np.zeros(n)
    for i in range(n):
        acc = 0.0
        for j in range(hlen):
            idx = (i - c + j * factor) % n
            acc += x[idx] * f[hlen - 1 - j]
        out[i] = acc
    return out


def ref_swt_synthesis_1d(lo, hi, fl, fh, level):
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    n = len(lo)
    hlen = len(fl)
    factor = 1 << (level - 1)
    c = (hlen // 2) * factor
    out = np.zeros(n)
    for g in range(n):
        acc = 0.0
        for j in range(hlen):
            idx = (g - c + j * factor) % n
            acc += lo[idx] * fl[hlen - 1 - j] / 2
            acc += hi[idx] * fh[hlen - 1 - j] / 2
        out[g] = acc
    return out


def ref_analysis_2d(img, f_lo, f_hi):
    """Two-pass separable forward: rows (last axis) then columns."""
    img = np.asarray(img, dtype=np.float64)
    t1 = np.stack([ref_analysis_1d(r, f_lo) for r in img])
    t2 = np.stack([ref_analysis_1d(r, f_hi) for r in img])
    a = np.stack([ref_analysis_1d(col, f_lo) for col in t1.T], axis=1)
    h = np.stack([ref_analysis_1d(col, f_hi) for col in t1.T], axis=1)
    v = np.stack([ref_analysis_1d(col, f_lo) for col in t2.T], axis=1)
    d = np.stack([ref_analysis_1d(col, f_hi) for col in t2.T], axis=1)
    return a, h, v, d


def ref_synthesis_2d(a, h, v, d, fl, fh, nr_out, nc_out):
    """Two-pass separable inverse: columns then rows (separable.cu:332-364)."""
    t1 = np.stack([ref_synthesis_1d(a[:, j], h[:, j], fl, fh, nr_out)
                   for j in range(a.shape[1])], axis=1)
    t2 = np.stack([ref_synthesis_1d(v[:, j], d[:, j], fl, fh, nr_out)
                   for j in range(a.shape[1])], axis=1)
    out = np.stack([ref_synthesis_1d(t1[i], t2[i], fl, fh, nc_out)
                    for i in range(nr_out)])
    return out
