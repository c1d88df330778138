"""BatchedWavelets — the ``Wavelets`` plan scaled out over a device mesh.

The reference processes one image per plan on one GPU; production TPU
workloads process stacks (tomography projections, video) across chips.
This class keeps the familiar surface (forward / threshold / inverse /
coeffs / norms) while the stack stays device-resident and sharded over
the mesh's data axis the whole time.  All compute is the functional core
under one jit per stage; XLA inserts the collectives (only the norms
need any — psum over shards, the distributed cuBLAS asum/nrm2 of
wt.cu:368-416).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..filters import get_filter_bank
from ..core import dwt, haar, swt, thresh
from ..core.shapes import clamp_levels
from . import mesh as pmesh
from .batch import shard_stack


class BatchedWavelets:
    """Wavelet plan for a (B, Nr, Nc) frame stack sharded across chips.

    Parameters mirror ``Wavelets`` (wname, levels, do_swt); ``mesh``
    defaults to all local devices on the data axis.  The batch axis must
    be divisible by the mesh's data-axis size.
    """

    def __init__(self, stack, wname, levels, do_swt=0, mesh=None):
        stack = np.asarray(stack, dtype=np.float32)
        if stack.ndim != 3:
            raise ValueError("BatchedWavelets expects a (B, Nr, Nc) stack")
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        n_data = self.mesh.shape[pmesh.BATCH_AXIS]
        if stack.shape[0] % n_data:
            raise ValueError(
                f"batch {stack.shape[0]} not divisible by data axis "
                f"{n_data}")
        self.B, self.Nr, self.Nc = stack.shape
        self.shape = stack.shape
        self.wname = wname
        self.do_swt = int(bool(do_swt))
        self._fb = get_filter_bank(wname)
        self.hlen = self._fb.hlen
        self.levels = clamp_levels(int(levels), (self.Nr, self.Nc),
                                   self.hlen, 2)

        self._stack = shard_stack(jnp.asarray(stack), self.mesh)
        self._coeffs = None

        fb = self._fb
        lv = self.levels
        use_haar = fb.hlen == 2 and not self.do_swt
        if use_haar:
            fwd = lambda x: haar.haar_wavedec2(x, lv)
            inv = lambda c: haar.haar_waverec2(c, self.shape)
        elif self.do_swt:
            fwd = lambda x: swt.swt2d(x, fb, lv)
            inv = lambda c: swt.iswt2d(c, fb)
        else:
            fwd = lambda x: dwt.wavedec2(x, fb, lv)
            inv = lambda c: dwt.waverec2(c, fb, self.shape)
        self._fwd = jax.jit(fwd)
        self._inv = jax.jit(inv)

    # ------------------------------------------------------------------

    def forward(self, stack=None):
        if stack is not None:
            stack = np.asarray(stack, dtype=np.float32)
            if stack.shape != self.shape:
                raise ValueError("stack shape changed")
            self._stack = shard_stack(jnp.asarray(stack), self.mesh)
        self._coeffs = self._fwd(self._stack)
        return self

    def inverse(self):
        if self._coeffs is None:
            raise RuntimeError("forward() has not been run")
        self._stack = self._inv(self._coeffs)
        return self

    def _guard(self):
        if self._coeffs is None:
            raise RuntimeError("forward() has not been run")

    def soft_threshold(self, beta, do_threshold_appcoeffs=0, normalize=0):
        self._guard()
        self._coeffs = thresh.soft_threshold(
            self._coeffs, float(beta), bool(do_threshold_appcoeffs),
            bool(normalize))

    def hard_threshold(self, beta, do_threshold_appcoeffs=0, normalize=0):
        self._guard()
        self._coeffs = thresh.hard_threshold(
            self._coeffs, float(beta), bool(do_threshold_appcoeffs),
            bool(normalize))

    def group_soft_threshold(self, beta, do_threshold_appcoeffs=0,
                             normalize=0):
        self._guard()
        self._coeffs = thresh.group_soft_threshold(
            self._coeffs, float(beta), bool(do_threshold_appcoeffs),
            bool(normalize))

    def shrink(self, beta, do_threshold_appcoeffs=1):
        self._guard()
        self._coeffs = thresh.shrink(self._coeffs, float(beta),
                                     bool(do_threshold_appcoeffs))

    def norm1(self):
        self._guard()
        return float(thresh.norm1(self._coeffs))

    def norm2sq(self):
        self._guard()
        return float(thresh.norm2sq(self._coeffs))

    def _denoise_step(self, normalize, hard):
        """Jitted fused step, cached per (normalize, hard); beta is a
        traced argument so sweeping it never recompiles (first compiles
        cost tens of seconds on this platform)."""
        key = (bool(normalize), bool(hard))
        cache = getattr(self, "_denoise_cache", None)
        if cache is None:
            cache = self._denoise_cache = {}
        if key not in cache:
            fb, lv, shape = self._fb, self.levels, self.shape
            swt_mode = self.do_swt

            def step(x, beta):
                if fb.hlen == 2 and not swt_mode:
                    pyr = haar.haar_wavedec2(x, lv)
                elif swt_mode:
                    pyr = swt.swt2d(x, fb, lv)
                else:
                    pyr = dwt.wavedec2(x, fb, lv)
                th = (thresh.hard_threshold if key[1]
                      else thresh.soft_threshold)
                pyr = th(pyr, beta, False, key[0])
                if fb.hlen == 2 and not swt_mode:
                    return haar.haar_waverec2(pyr, shape)
                if swt_mode:
                    return swt.iswt2d(pyr, fb)
                return dwt.waverec2(pyr, fb, shape)

            cache[key] = jax.jit(step)
        return cache[key]

    def denoise(self, beta, normalize=0, hard=False):
        """Fused forward -> threshold -> inverse (one compiled step,
        no host round trips); returns self."""
        step = self._denoise_step(normalize, hard)
        self._stack = step(self._stack, jnp.float32(beta))
        self._coeffs = None
        return self

    # ------------------------------------------------------------------

    @property
    def image(self):
        """The stack, gathered to host (B, Nr, Nc)."""
        return np.asarray(self._stack)

    def stack_device_array(self):
        return self._stack

    def coeff_only(self, num):
        """One coefficient plane for the whole batch, gathered to host."""
        self._guard()
        if num == 0:
            return np.asarray(self._coeffs[0])
        level = (num - 1) // 3 + 1
        sub = (num - 1) % 3
        if level > self.levels:
            raise ValueError(f"coefficient {num} out of range")
        return np.asarray(self._coeffs[level][sub])

    def coeffs_device(self):
        """The live sharded pyramid PyTree."""
        self._guard()
        return self._coeffs
