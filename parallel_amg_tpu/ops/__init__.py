"""Local sparse storage formats and kernels (SURVEY.md §2.2, layer L4).

Formats:
- :class:`~parallel_amg_tpu.ops.coo.COO` — triplet form, assembly-time.
- :class:`~parallel_amg_tpu.ops.csr.CSR` — compressed sparse row, the
  canonical interchange format (host build, setup-phase algorithms).
- :class:`~parallel_amg_tpu.ops.ell.ELL` — fixed-width padded rows; what the
  TPU compute path actually consumes (gathers become dense strided loads).
- :class:`~parallel_amg_tpu.ops.bsr.BSR` — r×c dense blocks for the MXU/VPU.

Pallas TPU kernels (BASELINE.json:5 "kernels written in Pallas"):
- :class:`~parallel_amg_tpu.ops.twell.TWELL` — tile-windowed ELL with a
  scalar-prefetch gather SpMV kernel (unstructured matrices);
- :class:`~parallel_amg_tpu.ops.flatdia.FlatDIA` — flattened-diagonal
  streaming SpMV/SpMM with double-buffered HBM→VMEM windows (banded /
  stencil matrices).
`jnp` reference implementations (ELL/DIA/Stencil/BSR) are the oracles.
"""

from parallel_amg_tpu.ops.bsr import BSR
from parallel_amg_tpu.ops.coo import COO
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.flatdia import FlatDIA
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.ops.twell import TWELL

__all__ = ["BSR", "COO", "CSR", "DIA", "ELL", "FlatDIA", "Stencil", "TWELL"]
