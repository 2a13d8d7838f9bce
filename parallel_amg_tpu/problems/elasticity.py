"""Multi-DOF (vector) model problems — the BSR workload (BASELINE.json:5,11).

``coupled_laplacian``: the 3-DOF vector Laplacian A = L ⊗ C — a scalar
N-D Dirichlet Laplacian L on the node grid with an SPD inter-component
coupling C = (1−γ)I + γ·11ᵀ at every node.  Every stored matrix entry is a
dense bs×bs block, the natural BSR unit; γ controls the coupling strength
(γ=0 decouples into bs independent Poisson problems).

This is the standard structured stand-in for linear elasticity (same
block-sparsity pattern as the 3-DOF displacement formulation) and the
workload behind the BSR benchmark row and the ≥100M-DOF BSR probe.
"""

from __future__ import annotations

import numpy as np

from parallel_amg_tpu.problems.stencil_problems import poisson_stencil


def coupling_matrix(bs: int = 3, gamma: float = 0.3) -> np.ndarray:
    """SPD coupling C = (1−γ)I + γ·11ᵀ (eigenvalues 1−γ and 1+(bs−1)γ)."""
    return (1.0 - gamma) * np.eye(bs) + gamma * np.ones((bs, bs))


def coupled_laplacian(dims, bs: int = 3, gamma: float = 0.3,
                      dtype=None):
    """(L: Stencil on dims, C: (bs,bs) np.ndarray) of A = L ⊗ C.

    Device-born: L's weight planes are jnp iota masks (no host nnz loop),
    so the ≥100M-DOF instances never exist on the host.
    """
    import jax.numpy as jnp

    L = poisson_stencil(tuple(int(d) for d in dims),
                        dtype=dtype or jnp.float32)
    return L, coupling_matrix(bs, gamma)


def coupled_laplacian_scipy(dims, bs: int = 3, gamma: float = 0.3):
    """Host f64 scipy CSR of A = L ⊗ C (oracle parity at small dims)."""
    import scipy.sparse as sp

    from parallel_amg_tpu.problems.poisson import poisson2d, poisson3d

    dims = tuple(int(d) for d in dims)
    if len(dims) == 2:
        L = poisson2d(*dims).to_csr().to_scipy()
    elif len(dims) == 3:
        L = poisson3d(*dims).to_csr().to_scipy()
    else:
        raise ValueError("2D/3D only")
    return sp.kron(L, coupling_matrix(bs, gamma), format="csr")
