"""Sharded fused-kernel routing: the shard_map spatial paths must run the
same fused Pallas level kernels as the single-chip path (interpret mode on
CPU), with edge halo blocks exchanged over the ring (VERDICT r2 item 1).

Each test asserts the kernel actually covers the geometry (build_* returns
non-None) so a silent fallback to the jnp path cannot masquerade as a
pass, then pins the sharded result to the unsharded core.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pypwt_tpu.filters import get_filter_bank
from pypwt_tpu.core import dwt, swt
from pypwt_tpu.ops import pallas_dwt as pk
from pypwt_tpu.parallel import mesh as pmesh, spatial

RNG = np.random.default_rng(23)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices")


def _taps(f):
    return tuple(float(v) for v in np.asarray(f, dtype=np.float64))


@pytest.fixture
def pallas_mode():
    dwt.set_kernels("pallas")
    try:
        yield
    finally:
        dwt.set_kernels("auto")


def _f32(shape):
    return jnp.asarray(RNG.standard_normal(shape), dtype=jnp.float32)


@pytest.mark.parametrize("wname", ["db2", "sym4"])
@pytest.mark.parametrize("n_rows", [4, 8])
def test_rowsharded_dwt_uses_fused_kernels(pallas_mode, wname, n_rows):
    fb = get_filter_bank(wname)
    img = _f32((256, 128))
    # the sharded builder must cover the local geometry
    assert pk.build_dwt2d_sharded(
        256 // n_rows, 128, _taps(fb.dec_lo), _taps(fb.dec_hi),
        True) is not None
    m = pmesh.make_mesh(n_data=8 // n_rows, n_rows=n_rows)
    pyr = spatial.wavedec2_rowsharded(img, fb, 2, m)
    ref = jax.jit(lambda x: dwt.wavedec2(x, fb, 2))(img)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5)
    assert pk.build_idwt2d_sharded(
        256 // n_rows, 128, _taps(fb.rec_lo), _taps(fb.rec_hi),
        True) is not None
    y = spatial.waverec2_rowsharded(pyr, fb, m)
    np.testing.assert_allclose(np.asarray(y), np.asarray(img), atol=3e-5)


def test_rowsharded_swt_uses_fused_kernels(pallas_mode):
    fb = get_filter_bank("db3")
    img = _f32((128, 128))
    assert pk.build_swt2d_sharded(
        32, 128, _taps(fb.dec_lo), _taps(fb.dec_hi), 1, True) is not None
    assert pk.build_iswt2d_sharded(
        32, 128, _taps(fb.rec_lo), _taps(fb.rec_hi), 1, True) is not None
    m = pmesh.make_mesh(n_data=2, n_rows=4)
    pyr = spatial.swt2d_rowsharded(img, fb, 2, m)
    ref = jax.jit(lambda x: swt.swt2d(x, fb, 2))(img)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5)
    y = spatial.iswt2d_rowsharded(pyr, fb, m)
    np.testing.assert_allclose(np.asarray(y), np.asarray(img), atol=1e-4)


def test_rowsharded_batched_fused(pallas_mode):
    fb = get_filter_bank("db2")
    x = _f32((4, 128, 128))
    m = pmesh.make_mesh(n_data=4, n_rows=2)
    pyr = spatial.wavedec2_rowsharded(x, fb, 2, m)
    ref = jax.jit(lambda v: dwt.wavedec2(v, fb, 2))(x)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5)
    y = spatial.waverec2_rowsharded(pyr, fb, m, batched=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=3e-5)


def test_fused_sharded_falls_back_when_uncovered(pallas_mode):
    # 20-row shards (not power-of-two banded): builder declines, jnp path
    # still exact
    fb = get_filter_bank("db2")
    img = _f32((40, 64))
    m = pmesh.make_mesh(n_data=4, n_rows=2)
    pyr = spatial.wavedec2_rowsharded(img, fb, 1, m)
    ref = jax.jit(lambda x: dwt.wavedec2(x, fb, 1))(img)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5)


@pytest.fixture
def mxu_mode():
    dwt.set_kernels("mxu")
    try:
        yield
    finally:
        dwt.set_kernels("auto")


@pytest.mark.parametrize("wname", ["sym8", "db10"])
def test_rowsharded_dwt_mxu_kernels(mxu_mode, wname):
    """Wide filters on the row-sharded path route to the banded MXU
    sharded builders (ops/mxu_dwt.py) and match the unsharded core."""
    from pypwt_tpu.ops import mxu_dwt as mx
    fb = get_filter_bank(wname)
    img = _f32((256, 128))
    n_rows = 4
    assert mx.build_dwt2d_sharded_mxu(
        256 // n_rows, 128, _taps(fb.dec_lo), _taps(fb.dec_hi),
        True) is not None
    assert mx.build_idwt2d_sharded_mxu(
        256 // n_rows, 128, _taps(fb.rec_lo), _taps(fb.rec_hi),
        True) is not None
    m = pmesh.make_mesh(n_data=8 // n_rows, n_rows=n_rows)
    pyr = spatial.wavedec2_rowsharded(img, fb, 2, m)
    ref = jax.jit(lambda x: dwt.wavedec2(x, fb, 2))(img)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)
    y = spatial.waverec2_rowsharded(pyr, fb, m)
    np.testing.assert_allclose(np.asarray(y), np.asarray(img), atol=5e-5)


def test_rowsharded_swt_mxu_kernels(mxu_mode):
    """Wide-filter row-sharded SWT routes to the banded MXU a-trous
    sharded builders and matches the unsharded core."""
    from pypwt_tpu.ops import mxu_swt as mxs
    fb = get_filter_bank("sym8")
    img = _f32((128, 128))
    n_rows = 4
    assert mxs.build_swt2d_sharded_mxu(
        128 // n_rows, 128, _taps(fb.dec_lo), _taps(fb.dec_hi), 1,
        True) is not None
    assert mxs.build_iswt2d_sharded_mxu(
        128 // n_rows, 128, _taps(fb.rec_lo), _taps(fb.rec_hi), 1,
        True) is not None
    m = pmesh.make_mesh(n_data=8 // n_rows, n_rows=n_rows)
    pyr = spatial.swt2d_rowsharded(img, fb, 2, m)
    ref = jax.jit(lambda x: swt.swt2d(x, fb, 2))(img)
    for a, b in zip(jax.tree.leaves(pyr), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)
    y = spatial.iswt2d_rowsharded(pyr, fb, m)
    np.testing.assert_allclose(np.asarray(y), np.asarray(img), atol=5e-5)
