"""Device-native problem generators: build Stencil weight planes directly.

For the ≥100M-DOF configs (BASELINE.json:11) even assembling a host COO is
gigabytes of index traffic; these generators produce the (D, *dims) weight
planes as jnp ops (broadcasted iota masks), so the operator is born on the
accelerator — the per-shard "never materialize globally" assembly style of
the reference (SURVEY.md §3.4) taken to its TPU-native conclusion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parallel_amg_tpu.ops.stencil import Stencil


def _axis_mask(dims, axis, sgn, dtype):
    """1 where the neighbor at offset sgn along axis exists, else 0."""
    idx = jax.lax.broadcasted_iota(jnp.int32, dims, axis)
    if sgn > 0:
        return (idx < dims[axis] - 1).astype(dtype)
    return (idx > 0).astype(dtype)


@partial(jax.jit, static_argnames=("dims", "dtype"))
def poisson_stencil(dims, dtype=jnp.float32) -> Stencil:
    """N-D (2N+1)-point Dirichlet Laplacian as a device Stencil.

    Matches problems.poisson2d/3d exactly (diag 2N, off-diagonals −1 where
    the neighbor exists).  Jitted: one compile instead of an eager op per
    plane (which serializes through the remote-compile tunnel)."""
    dims = tuple(int(d) for d in dims)
    nd = len(dims)
    offsets = [tuple(0 for _ in dims)]
    planes = [jnp.full(dims, 2.0 * nd, dtype)]
    for axis in range(nd):
        for sgn in (-1, 1):
            off = tuple(sgn if i == axis else 0 for i in range(nd))
            offsets.append(off)
            planes.append(-_axis_mask(dims, axis, sgn, dtype))
    order = sorted(range(len(offsets)), key=lambda i: offsets[i])
    return Stencil(
        jnp.stack([planes[i] for i in order]),
        tuple(offsets[i] for i in order),
        dims,
    )


@partial(jax.jit, static_argnames=("dims", "epsilon", "dtype"))
def anisotropic_stencil(dims, epsilon: float = 1e-3,
                        dtype=jnp.float32) -> Stencil:
    """2D anisotropic −u_xx − ε·u_yy operator as a device Stencil
    (matches problems.anisotropic2d; y is the second/fast axis)."""
    dims = tuple(int(d) for d in dims)
    assert len(dims) == 2
    offsets = [(0, 0)]
    planes = [jnp.full(dims, 2.0 + 2.0 * epsilon, dtype)]
    for axis, w in ((0, 1.0), (1, epsilon)):
        for sgn in (-1, 1):
            off = tuple(sgn if i == axis else 0 for i in range(2))
            offsets.append(off)
            planes.append(-w * _axis_mask(dims, axis, sgn, dtype))
    order = sorted(range(len(offsets)), key=lambda i: offsets[i])
    return Stencil(
        jnp.stack([planes[i] for i in order]),
        tuple(offsets[i] for i in order),
        dims,
    )
