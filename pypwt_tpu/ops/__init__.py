"""TPU kernel layer (Pallas) — per-chip speed-of-light filter banks.

The reference implements its hot loops as CUDA kernels
(pdwt/src/separable.cu, nonseparable.cu, haar.cu); here they are Mosaic
(Pallas-TPU) kernels that fuse the two separable passes of each DWT level
into a single VMEM-resident kernel, halving HBM round-trips versus the
two-pass jnp formulation.  The jnp path (pypwt_tpu.core.conv) remains the
correctness oracle and the fallback for shapes the kernels do not cover.
"""

from . import pallas_dwt  # noqa: F401
