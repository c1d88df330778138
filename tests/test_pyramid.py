"""Whole-pyramid fused kernels vs the per-level jnp path (interpret
mode on CPU).  ops/fused_pyramid.py computes every level in one Pallas
call with overlapped-tile margins; these tests pin its outputs to the
jnp oracle path to ~1e-6 and the roundtrip to f32 exactness.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import dwt
from pypwt_tpu.ops import fused_pyramid as fp


def _rand(shape):
    return jnp.asarray(
        np.random.default_rng(5).random(shape, dtype=np.float32))


@pytest.mark.parametrize("wname", ["haar", "db2", "db4", "sym8",
                                   "bior4.4"])
@pytest.mark.parametrize("shape,levels", [((128, 128), 2),
                                          ((256, 128), 3),
                                          ((128, 256), 3)])
def test_pyramid_analysis_matches_jnp(wname, shape, levels):
    fb = get_filter_bank(wname)
    x = _rand(shape)
    dwt.set_kernels("jnp")
    try:
        want = dwt.wavedec2(x, fb, levels)
    finally:
        dwt.set_kernels("auto")
    got = fp.wavedec2_pyramid(x, fb, levels)
    if got is None:
        pytest.skip("config not covered by pyramid kernel")
    assert len(got) == len(want)
    assert float(jnp.abs(got[0] - want[0].astype(jnp.float32)).max()) \
        < 1e-5
    for lev in range(1, levels + 1):
        for g, w in zip(got[lev], want[lev]):
            assert g.shape == w.shape, (wname, lev)
            assert float(jnp.abs(g - w.astype(jnp.float32)).max()) \
                < 1e-5, (wname, lev)


@pytest.mark.parametrize("wname", ["haar", "db2", "sym8"])
def test_pyramid_roundtrip(wname):
    fb = get_filter_bank(wname)
    shape, levels = (256, 256), 3
    x = _rand(shape)
    c = fp.wavedec2_pyramid(x, fb, levels)
    if c is None:
        pytest.skip("config not covered")
    y = fp.waverec2_pyramid(c, fb, shape)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 1e-5


@pytest.mark.parametrize("wname", ["db2", "db4"])
def test_pyramid_synthesis_matches_jnp(wname):
    fb = get_filter_bank(wname)
    shape, levels = (128, 128), 2
    x = _rand(shape)
    dwt.set_kernels("jnp")
    try:
        c = dwt.wavedec2(x, fb, levels)
        want = dwt.waverec2(c, fb, shape)
    finally:
        dwt.set_kernels("auto")
    c32 = [c[0].astype(jnp.float32)] + [
        tuple(p.astype(jnp.float32) for p in t) for t in c[1:]]
    got = fp.waverec2_pyramid(c32, fb, shape)
    if got is None:
        pytest.skip("config not covered")
    assert float(jnp.abs(got - want.astype(jnp.float32)).max()) < 1e-5


def test_pyramid_batched_vmap():
    fb = get_filter_bank("db2")
    x = _rand((2, 128, 128))
    got = fp.wavedec2_pyramid(x, fb, 2)
    if got is None:
        pytest.skip("config not covered")
    dwt.set_kernels("jnp")
    try:
        want = dwt.wavedec2(x, fb, 2)
    finally:
        dwt.set_kernels("auto")
    for g, w in zip(got[1], want[1]):
        assert g.shape == w.shape
        assert float(jnp.abs(g - w.astype(jnp.float32)).max()) < 1e-5
    y = fp.waverec2_pyramid(got, fb, x.shape)
    assert y is not None
    assert float(jnp.abs(y - x).max()) < 1e-5


def test_pyramid_fallbacks():
    fb = get_filter_bank("db2")
    assert fp.wavedec2_pyramid(_rand((100, 128)), fb, 2) is None
    assert fp.wavedec2_pyramid(_rand((128, 128)), fb, 1) is None


def test_tailfused_wavedec_matches_per_level():
    """Level-0-standalone + fused tail (dwt.wavedec2_tailfused) against
    the per-level path, both directions."""
    fb = get_filter_bank("db2")
    shape, levels = (256, 256), 3
    x = _rand(shape)
    dwt.set_kernels("pallas")
    try:
        got = dwt.wavedec2_tailfused(x, fb, levels)
        assert got is not None
        want = dwt.wavedec2(x, fb, levels)
        for g, w in zip(
                __import__("jax").tree.leaves(got),
                __import__("jax").tree.leaves(want)):
            assert float(jnp.abs(g - w).max()) < 1e-5
        y = dwt.waverec2_tailfused(got, fb, shape)
        assert y is not None
        assert float(jnp.abs(y - x).max()) < 1e-5
    finally:
        dwt.set_kernels("auto")
