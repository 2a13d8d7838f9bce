"""with_spmv_backend: Pallas (FlatDIA) ↔ XLA (Stencil) hierarchy swap."""

import jax.numpy as jnp
import numpy as np

import parallel_amg_tpu as pat
from parallel_amg_tpu.amg.hierarchy import with_spmv_backend
from parallel_amg_tpu.ops.flatdia import FlatDIA
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil


def test_vcycle_matches_across_backends(rng):
    dims = (18, 18)
    st = poisson_stencil(dims)
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=16,
                        on_device_setup=True)
    h = pat.setup(st, cfg)
    hp = with_spmv_backend(h, "pallas")
    assert all(isinstance(l.A, FlatDIA) for l in hp.levels)
    b = jnp.asarray(rng.normal(size=dims), jnp.float32)
    x0 = jnp.zeros_like(b)
    y_xla = np.asarray(pat.vcycle(h, x0, b))
    y_pal = np.asarray(pat.vcycle(hp, x0, b))
    np.testing.assert_allclose(y_pal, y_xla, rtol=2e-5, atol=2e-6)

    # exact round-trip back to the XLA path (levels whose flattening
    # aliased planes — tiny coarse grids — stay FlatDIA by design)
    hx = with_spmv_backend(hp, "xla")
    assert isinstance(hx.levels[0].A, Stencil)
    for la, lb in zip(h.levels, hx.levels):
        if isinstance(lb.A, Stencil):
            assert la.A.offsets == lb.A.offsets
            np.testing.assert_array_equal(np.asarray(la.A.weights),
                                          np.asarray(lb.A.weights))


def test_pcg_converges_on_pallas_backend(rng):
    dims = (16, 16)
    st = poisson_stencil(dims)
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                        smoother="chebyshev", n_coarse_max=16,
                        on_device_setup=True)
    h = with_spmv_backend(pat.setup(st, cfg), "pallas")
    b = jnp.asarray(rng.normal(size=dims), jnp.float32)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=50)
    assert bool(res.converged)
