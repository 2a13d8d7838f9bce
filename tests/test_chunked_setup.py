"""Structured triple-product engines agree (dense / slab / bucketed).

The slab path (device_setup.chunked_coarse_operator) and bucketed path
(bucketed_coarse_operator) exist for the ≥100M-DOF configs where the dense
full-grid intermediates exceed HBM (BASELINE.json:11):
- slab must equal dense EXACTLY (same pipeline in slabs, halos cover every
  shift);
- bucketed computes the exact Galerkin product (no intermediate
  sparsification), so it must equal dense when intermediate sparsification
  is disabled (setup_intermediate_tol=0).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

import parallel_amg_tpu as pat
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil


def _setup(st, path, block=3, budget_mb=1, it=None):
    kw = dict(coarsening="sa", aggregate="block", block_size=block,
              smoother="chebyshev", n_coarse_max=32, on_device_setup=True,
              setup_product_path=path, setup_chunk_budget_mb=budget_mb)
    if it is not None:
        kw["setup_intermediate_tol"] = it
    return pat.setup(st, pat.AMGConfig(**kw))


def _assert_levels_match(ha, hb, rtol=1e-5, atol=1e-6):
    assert ha.n_levels == hb.n_levels
    for la, lb in zip(ha.levels, hb.levels):
        Aa = np.asarray(la.A.to_csr().to_dense())
        Ab = np.asarray(lb.A.to_csr().to_dense())
        np.testing.assert_allclose(Ab, Aa, rtol=rtol, atol=atol)


def test_slab_matches_dense_3d(rng):
    dims = (12, 10, 9)
    st = poisson_stencil(dims)
    # 1 MB budget forces many thin slabs
    _assert_levels_match(_setup(st, "dense"), _setup(st, "slab"))

    h = _setup(st, "slab")
    b = jnp.asarray(rng.normal(size=dims), jnp.float32)
    r = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=50)
    assert bool(r.converged)


def test_slab_matches_dense_2d(rng):
    st = poisson_stencil((21, 14))
    _assert_levels_match(_setup(st, "dense"), _setup(st, "slab"))


def test_bucketed_matches_exact_dense_3d(rng):
    dims = (12, 10, 9)
    st = poisson_stencil(dims)
    # it=0 disables intermediate sparsification → dense is the exact
    # Galerkin product, which bucketed computes by construction
    _assert_levels_match(_setup(st, "dense", it=0.0),
                         _setup(st, "bucketed", it=0.0))
    h = _setup(st, "bucketed")
    b = jnp.asarray(rng.normal(size=dims), jnp.float32)
    r = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=50)
    assert bool(r.converged)


def test_bucketed_matches_exact_dense_2d_block2(rng):
    st = poisson_stencil((18, 13))
    _assert_levels_match(_setup(st, "dense", block=2, it=0.0),
                         _setup(st, "bucketed", block=2, it=0.0))
