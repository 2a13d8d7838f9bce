"""Hierarchy checkpoint/resume round-trip (SURVEY.md §5)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.problems import poisson2d
from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy


def test_hierarchy_roundtrip(tmp_path, rng):
    A = sp.csr_matrix(
        (poisson2d(24).val, (poisson2d(24).row, poisson2d(24).col)),
        shape=poisson2d(24).shape,
    )
    cfg = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                    smoother="chebyshev", n_coarse_max=64)
    h = pat.setup(A, cfg, dims=(24, 24))
    path = str(tmp_path / "h.pkl")
    save_hierarchy(path, h)
    h2 = load_hierarchy(path)
    assert len(h2.levels) == len(h.levels)
    assert h2.config == h.config
    b = jnp.asarray(rng.normal(size=A.shape[0]), jnp.float32)
    x1 = pat.vcycle(h, jnp.zeros_like(b), b)
    x2 = pat.vcycle(h2, jnp.zeros_like(b), b)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-6)


def test_solver_state_roundtrip(tmp_path, rng):
    """Long-CG checkpointing: (x, r, k) state survives a save/load."""
    from parallel_amg_tpu.utils.checkpoint import load_pytree, save_pytree

    state = {"x": jnp.asarray(rng.normal(size=64), jnp.float32),
             "r": jnp.asarray(rng.normal(size=64), jnp.float32),
             "k": jnp.asarray(17)}
    path = str(tmp_path / "state.pkl")
    save_pytree(path, state)
    state2 = load_pytree(path)
    np.testing.assert_allclose(np.asarray(state["x"]), np.asarray(state2["x"]))
    assert int(state2["k"]) == 17
