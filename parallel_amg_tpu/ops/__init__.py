"""Local sparse storage formats and kernels (SURVEY.md §2.2, layer L4).

Formats:
- :class:`~parallel_amg_tpu.ops.coo.COO` — triplet form, assembly-time.
- :class:`~parallel_amg_tpu.ops.csr.CSR` — compressed sparse row, the
  canonical interchange format (host build, setup-phase algorithms).
- :class:`~parallel_amg_tpu.ops.ell.ELL` — fixed-width padded rows; what the
  TPU compute path actually consumes (gathers become dense strided loads).
- :class:`~parallel_amg_tpu.ops.bsr.BSR` — r×c dense blocks for the MXU/VPU.

Kernels: `jnp` reference implementations here; Pallas TPU kernels in
``parallel_amg_tpu.ops.pallas``.
"""

from parallel_amg_tpu.ops.coo import COO
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL

__all__ = ["COO", "CSR", "ELL"]
