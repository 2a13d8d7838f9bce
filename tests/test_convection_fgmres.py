"""Nonsymmetric convection-diffusion + AMG-FGMRES (VERDICT r3 item 9).

The workload CG cannot handle: first-order-upwind convection-diffusion at
cell Péclet 5 is a strongly nonsymmetric M-matrix, so CG's SPD three-term
recurrence has no convergence guarantee and stalls, while AMG-preconditioned
flexible GMRES converges in a few restart cycles — matching a scipy
GMRES run preconditioned by the f64 oracle V-cycle on the same matrix
(the oracle-band criterion at 256²).
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.problems import convection2d

NX = 256
PE = 5.0


def _problem():
    coo = convection2d(NX, pe_x=PE, pe_y=0.5 * PE)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    b = np.random.default_rng(0).normal(size=A_sp.shape[0])
    return coo, A_sp, b


def test_matrix_shape_and_upwind_sign():
    coo, A_sp, _ = _problem()
    # strictly diagonally dominant M-matrix: positive diagonal, nonpositive
    # off-diagonals, nonnegative row sums
    d = A_sp.diagonal()
    assert np.all(d > 0)
    off = A_sp - sp.diags(d)
    assert off.nnz and np.all(off.data <= 0)
    assert np.all(np.asarray(A_sp.sum(axis=1)).ravel() >= -1e-12)
    # genuinely nonsymmetric
    asym = abs(A_sp - A_sp.T)
    assert asym.max() > PE - 1e-12


def test_amg_fgmres_converges_where_cg_fails():
    coo, A_sp, b = _problem()
    cfg = AMGConfig(coarsening="rs", smoother="jacobi", n_coarse_max=128,
                    interpolation="extended_i")
    h = pat.setup(coo.to_csr(), cfg)
    b32 = jnp.asarray(b, jnp.float32)

    # CG on the nonsymmetric operator: no SPD inner product — must fail
    res_cg = pat.amg_pcg(h.levels[0].A, h, b32, tol=1e-6, maxiter=80)
    assert not bool(res_cg.converged), (
        "CG unexpectedly converged on a Péclet-5 nonsymmetric operator")

    # AMG-FGMRES: converges, and the solution truly solves the system
    res = pat.amg_fgmres(h.levels[0].A, h, b32, tol=1e-6, restart=30,
                         max_restarts=20)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(b - A_sp @ x) / np.linalg.norm(b)
    assert rel < 5e-6

    # oracle band: scipy GMRES(30) preconditioned by the f64 oracle V-cycle
    # on the same matrix — our restart-cycle count within the band
    from parallel_amg_tpu.oracle.serial_amg import oracle_setup, oracle_vcycle

    oh = oracle_setup(A_sp, cfg)
    M = spla.LinearOperator(
        A_sp.shape, matvec=lambda r: oracle_vcycle(oh, np.zeros_like(r), r))
    outer = {"n": 0}

    def cb(_):
        outer["n"] += 1

    x_o, info = spla.gmres(A_sp, b, M=M, restart=30, maxiter=20,
                           rtol=1e-6, callback=cb,
                           callback_type="pr_norm")
    assert info == 0
    oracle_cycles = max(outer["n"] // 30 + 1, 1)
    assert int(res.iters) <= oracle_cycles + 2
