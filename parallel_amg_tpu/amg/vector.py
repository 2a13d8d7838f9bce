"""Vector (multi-DOF / BSR) AMG setup — Kronecker unknown-based hierarchy.

For block operators A = L ⊗ C (``problems/elasticity.py``) the standard
structured systems-AMG choice is the *unknown-based* hierarchy: transfers
P = P_s ⊗ I with the SCALAR-smoothed prolongator P_s = (I − coef·D_L⁻¹L)T_s,
under which every Galerkin coarse operator stays exactly L_c ⊗ C:

    (P_s ⊗ I)ᵀ (L ⊗ C) (P_s ⊗ I) = (P_sᵀ L P_s) ⊗ C.

So the vector setup IS the scalar on-device setup (amg/device_setup.py) plus
a Kronecker wrap per level — no new O(n) setup work, and the eigensystem
factors: λ_max(D⁻¹A) = λ_max(D_L⁻¹L) · λ_max(D_C⁻¹C), (L_c ⊗ C)⁻¹ =
L_c⁻¹ ⊗ C⁻¹ (pseudo-inverse on the L factor).

Storage (BASELINE.json:5 "CSR/COO/BSR storage"): the FINE level is real
block-ELL BSR (``fine_format="bsr"``, the benched format — batched bs×bs
einsum SpMV); coarse levels are :class:`BlockStencil` (scalar planes + one
C mix, zero index traffic).  ``fine_format="bstencil"`` keeps the fine level
structured too, as the measured comparison point for the bench.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.amg.device_setup import device_structured_setup
from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.bstencil import (
    BlockStencil,
    BSRGridOperator,
    VectorBlockProlongator,
    VectorBlockRestrictor,
    bsr_from_kron_stencil,
)
from parallel_amg_tpu.ops.stencil import Stencil


def setup_vector_kron(L: Stencil, C, config: AMGConfig,
                      dtype=jnp.float32, seed: int = 0,
                      fine_format: str = "bsr") -> Hierarchy:
    """Build the vector hierarchy of A = L ⊗ C from the scalar setup.

    L: scalar fine-level Stencil (node grid); C: SPD (bs, bs) coupling.

    fine_format — measured SpMV engines at 128³×3 on v5e (f32):
      "bstencil"  632 Gnnz/s — structured Kronecker fast path (default
                  recommendation when the block matrix IS stencil-shaped);
      "btwell"    5.5 Gnnz/s — the general Pallas block-TWELL BSR kernel
                  (piece-overhead bound on 3D stencils, whose z-neighbors
                  land ~n² block-columns away and defeat window locality);
      "bsr"       1.1 Gnnz/s — block-ELL with XLA einsum+gather (the
                  reference formulation; the gather scalarizes on TPU).
    """
    assert fine_format in ("bsr", "btwell", "bstencil")
    C = np.asarray(C, np.float64)
    bs = C.shape[0]
    # λ_max(D_C⁻¹C) and C⁻¹ — tiny host eigenproblems, exact
    dC = np.diagonal(C)
    lam_C = float(np.max(np.abs(np.linalg.eigvals(C / dC[:, None]))))
    C_inv = np.linalg.inv(C)
    inv_dC = jnp.asarray(1.0 / dC, dtype)

    hs = device_structured_setup(L, config, dtype=dtype, seed=seed)

    levels: List[Level] = []
    for i, sl in enumerate(hs.levels):
        Li: Stencil = sl.A
        if i == 0 and fine_format in ("bsr", "btwell"):
            if fine_format == "btwell":
                from parallel_amg_tpu.ops.btwell import (
                    btwell_from_kron_stencil,
                )

                fine = btwell_from_kron_stencil(Li, C, dtype)
            else:
                fine = bsr_from_kron_stencil(Li, C, dtype)
            A = BSRGridOperator(fine, Li.dims)
            # BSR cannot yield its scalar factor: the level-0 transfers
            # carry L's planes themselves (shared jnp buffers — no copy)
            P_L, P_dinv = Li, sl.d_inv
        else:
            A = BlockStencil(Li.weights, Li.offsets, Li.dims,
                             jnp.asarray(C, dtype))
            P_L = P_dinv = None  # linked: transfers borrow A.scalar()
        d_inv = sl.d_inv[..., None] * inv_dC[(None,) * len(Li.dims)]
        lam = sl.lam_max * lam_C
        P = R = None
        if sl.P is not None:
            P = VectorBlockProlongator(P_L, P_dinv, sl.P.scale, sl.P.coef,
                                       sl.P.dims, sl.P.cdims, sl.P.block, bs)
            R = VectorBlockRestrictor(P_L, P_dinv, sl.R.scale, sl.R.coef,
                                      sl.R.dims, sl.R.cdims, sl.R.block, bs)
        levels.append(Level(A, P, R, d_inv, lam))

    coarse_inv = jnp.asarray(
        np.kron(np.asarray(hs.coarse_inv, np.float64), C_inv), jnp.float32)
    return Hierarchy(levels, coarse_inv, config)
