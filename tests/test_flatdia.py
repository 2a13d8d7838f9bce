"""FlatDIA (Pallas streaming DIA SpMV/SpMM) vs XLA-path oracles.

Runs the kernels in Pallas interpret mode on the CPU test mesh (SURVEY.md
§4.1: interpret mode for logic, compiled mode on TPU for numerics — the
bench runs compiled).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.flatdia import FlatDIA, dia_spmv
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil


def random_stencil(rng, dims):
    """Variable-coefficient Poisson-like stencil with boundary zeroing."""
    st = poisson_stencil(dims)
    w = st.weights * jnp.asarray(
        rng.uniform(0.5, 2.0, size=st.weights.shape), jnp.float32)
    return type(st)(w, st.offsets, dims)


@pytest.mark.parametrize("dims", [(12, 9), (6, 7, 5), (64,)])
def test_from_stencil_matvec_matches(rng, dims):
    st = random_stencil(rng, dims)
    fd = FlatDIA.from_stencil(st)
    x = jnp.asarray(rng.normal(size=dims), jnp.float32)
    got = np.asarray(fd.matvec(x))
    want = np.asarray(st.matvec(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_from_dia_matvec_matches(rng):
    n = 200
    offsets = (-14, -1, 0, 1, 14)
    diags = np.zeros((len(offsets), n))
    for d, o in enumerate(offsets):
        lo, hi = max(0, -o), max(0, o)
        diags[d, lo:n - hi if hi else n] = rng.normal(size=n - lo - hi)
    dia = DIA(jnp.asarray(diags, jnp.float32), offsets, (n, n))
    fd = FlatDIA.from_dia(dia)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fd.matvec(x)), np.asarray(dia.matvec(x)),
        rtol=1e-5, atol=1e-5)


def test_spmm_matches_loop(rng):
    dims = (9, 8)
    st = random_stencil(rng, dims)
    fd = FlatDIA.from_stencil(st)
    k = 5
    X = jnp.asarray(rng.normal(size=(np.prod(dims), k)), jnp.float32)
    got = np.asarray(fd.matmat(X.reshape(dims + (k,))))
    want = np.stack(
        [np.asarray(st.matvec(X[:, j].reshape(dims))).reshape(-1)
         for j in range(k)], axis=-1,
    ).reshape(dims + (k,))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_diagonal_and_scale_rows(rng):
    dims = (11, 7)
    st = random_stencil(rng, dims)
    fd = FlatDIA.from_stencil(st)
    np.testing.assert_allclose(
        np.asarray(fd.diagonal()), np.asarray(st.diagonal()), rtol=1e-6)
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=dims), jnp.float32)
    x = jnp.asarray(rng.normal(size=dims), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fd.scale_rows(s).matvec(x)),
        np.asarray(s * st.matvec(x)), rtol=1e-5, atol=1e-5)


def test_offset_alias_on_tiny_grid(rng):
    # (1, -3) and (0, 0) alias in flattened form on a 3-wide grid only if
    # |col offset| >= width; craft one: offsets (0,3) stride -> (1,0)
    from parallel_amg_tpu.ops.stencil import Stencil

    dims = (4, 3)
    offs = ((0, 0), (1, 0), (0, 3))  # (0,3) aliases (1,0) in 1-D
    w = jnp.asarray(rng.normal(size=(3, 4, 3)), jnp.float32)
    # zero out entries whose neighbor leaves the grid (Stencil convention)
    wn = np.asarray(w).copy()
    for d, o in enumerate(offs):
        for i in range(4):
            for j in range(3):
                ni, nj = i + o[0], j + o[1]
                if not (0 <= ni < 4 and 0 <= nj < 3):
                    wn[d, i, j] = 0.0
    st = Stencil(jnp.asarray(wn), offs, dims)
    fd = FlatDIA.from_stencil(st)
    assert fd.n_points == 2  # aliased planes merged
    x = jnp.asarray(rng.normal(size=dims), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fd.matvec(x)), np.asarray(st.matvec(x)),
        rtol=1e-5, atol=1e-5)


def test_functional_spmv_padding(rng):
    # n not a multiple of the tile exercises the padded tail
    n = 1000
    offsets = (-1, 0, 1)
    diags = np.zeros((3, n))
    diags[0, 1:] = rng.normal(size=n - 1)
    diags[1] = rng.normal(size=n)
    diags[2, :-1] = rng.normal(size=n - 1)
    from parallel_amg_tpu.ops.flatdia import default_tile

    tile = default_tile(n, 3)
    n_pad = -(-n // tile) * tile
    dp = jnp.asarray(np.pad(diags, ((0, 0), (0, n_pad - n))), jnp.float32)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    got = np.asarray(dia_spmv(dp, offsets, x, n))
    A = np.zeros((n, n))
    for d, o in enumerate(offsets):
        idx = np.arange(max(0, -o), n - max(0, o))
        A[idx, idx + o] = diags[d, idx]
    np.testing.assert_allclose(got, A @ np.asarray(x), rtol=1e-4, atol=1e-4)
