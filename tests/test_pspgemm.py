"""Pallas two-phase SpGEMM (ops/pspgemm.py) — parity vs the ESC reference
on the Galerkin-chain product shapes (interpret machine on CPU; the TPU
numbers live in bench_details/docs/SPGEMM.md)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.ell_setup import ell_spgemm
from parallel_amg_tpu.ops.pspgemm import PallasSpgemmPlan, pallas_spgemm
from parallel_amg_tpu.problems import poisson2d


def _to_sp(C, shape):
    R, W = C.cols.shape
    m = sp.csr_matrix(
        (np.asarray(C.vals).ravel(),
         (np.repeat(np.arange(R), W), np.asarray(C.cols).ravel())),
        shape=shape)
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


def _ell(A_sp):
    return ELL.from_csr(CSR.from_scipy(A_sp.tocsr()), dtype=jnp.float32)


def test_pallas_spgemm_square_parity():
    coo = poisson2d(24)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A = _ell(A_sp)
    C = pallas_spgemm(A, A)
    ref = (A_sp @ A_sp).astype(np.float32)
    d = abs(_to_sp(C, A_sp.shape) - ref)
    assert (d.max() if d.nnz else 0.0) < 1e-4


def test_pallas_spgemm_rect_galerkin_chain():
    """The production shapes: R·A and (RA)·P on a PMIS/smoothed-direct
    level (rectangular operands, irregular widths)."""
    from parallel_amg_tpu.oracle.serial_amg import (
        classical_strength,
        pmis_split,
        smoothed_direct_interpolation,
    )

    coo = poisson2d(24)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    S = classical_strength(A_sp, 0.25)
    state = pmis_split(S, seed=0)
    P_sp = smoothed_direct_interpolation(A_sp, S, state, 2 / 3, 4)
    R_sp = P_sp.T.tocsr()

    A, P, R = _ell(A_sp), _ell(P_sp), _ell(R_sp)
    RA = pallas_spgemm(R, A)
    d1 = abs(_to_sp(RA, (R_sp.shape[0], A_sp.shape[1]))
             - (R_sp @ A_sp).astype(np.float32))
    assert (d1.max() if d1.nnz else 0.0) < 1e-4

    RA_ell = ell_spgemm(_ell(R_sp @ A_sp), _ell(sp.identity(
        A_sp.shape[0], format="csr")))  # compacted reference operand
    Ac = pallas_spgemm(_ell((R_sp @ A_sp).tocsr()), P)
    ref = (R_sp @ A_sp @ P_sp).astype(np.float32)
    d2 = abs(_to_sp(Ac, ref.shape) - ref)
    assert (d2.max() if d2.nnz else 0.0) < 1e-4


def test_pallas_spgemm_plan_reuse():
    """The symbolic phase (plan) is reusable across right-hand operands."""
    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A = _ell(A_sp)
    plan = PallasSpgemmPlan.from_ell(A)
    C1 = pallas_spgemm(A, A, plan=plan)
    B_sp = (A_sp * 2.0).tocsr()
    C2 = pallas_spgemm(A, _ell(B_sp), plan=plan)
    d = abs(_to_sp(C2, A_sp.shape) - 2.0 * _to_sp(C1, A_sp.shape))
    assert (d.max() if d.nnz else 0.0) < 1e-4
