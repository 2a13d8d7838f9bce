"""Mixed precision: bf16 hierarchy as preconditioner, f32 operator for CG.

bf16 weight planes halve the V-cycle's HBM traffic; CG's outer recurrence
in f32 absorbs the preconditioner perturbation (measured: identical
iteration counts on the acceptance problems).
"""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.problems import poisson3d


def test_bf16_preconditioner_f32_operator(rng):
    coo = poisson3d(12)
    A = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    cfg = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                    smoother="chebyshev", n_coarse_max=64)
    h32 = pat.setup(A, cfg, dims=(12, 12, 12), dtype=jnp.float32)
    h16 = pat.setup(A, cfg, dims=(12, 12, 12), dtype=jnp.bfloat16)
    assert h16.levels[0].A.weights.dtype == jnp.bfloat16
    b = rng.normal(size=A.shape[0])
    bj = jnp.asarray(b, jnp.float32)
    # f32 operator + bf16 preconditioner
    res16 = pat.amg_pcg(h32.levels[0].A, h16, bj, tol=1e-6, maxiter=60)
    res32 = pat.amg_pcg(h32.levels[0].A, h32, bj, tol=1e-6, maxiter=60)
    assert bool(res16.converged)
    assert abs(int(res16.iters) - int(res32.iters)) <= 2
    x = np.asarray(res16.x, np.float64).reshape(-1)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
