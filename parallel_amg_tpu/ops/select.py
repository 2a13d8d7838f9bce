"""Automatic storage-format selection for the TPU compute path.

Policy (measured on v5e, see ops/dia.py and ops/twell.py rationale):
1. DIA when the matrix is banded with a bounded diagonal count — streaming
   shifted reads, ~93% of memcpy speed-of-light;
2. TWELL otherwise on TPU — the Pallas within-tile-gather kernel;
3. ELL (jnp.take reference path) otherwise off-TPU, where TWELL would run
   in the slow Pallas interpreter (tests) and XLA's CPU gather is fine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.twell import TWELL

# DIA is preferred while its traffic D·n stays within this factor of the
# nnz-proportional ELL traffic (diagonal fill can be sparse on deep levels).
_DIA_MAX_DIAGS = 192


def best_format(csr, dtype=jnp.float32, square_hint: bool | None = None):
    """Pick the fastest device format for a host CSR matrix."""
    n_rows, n_cols = csr.shape
    if n_rows == n_cols:
        dia = DIA.from_csr(csr, dtype=dtype, max_diags=_DIA_MAX_DIAGS)
        if dia is not None:
            # reject DIA when the band is mostly empty (traffic blow-up):
            # D·n values stored vs nnz actual
            fill = csr.nnz / max(dia.n_diags * n_rows, 1)
            if fill > 0.15 or dia.n_diags <= 32:
                return dia
    if jax.default_backend() == "tpu":
        return TWELL.from_csr(csr, dtype=dtype)
    return ELL.from_csr(csr, dtype=dtype)
