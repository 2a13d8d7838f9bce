"""Poisson finite-difference operators (Dirichlet), vectorized numpy builds.

2D 5-point and 3D 7-point stencils on unit grids — the acceptance workloads
of BASELINE.json:7,8,9,11.  ``row_range`` supports per-shard assembly: each
shard builds only its own row block (the distributed-assembly pattern the
reference inherits from PartitionedArrays' per-part assembly, SURVEY.md §3.4),
so the ≥100M-DOF config never materializes a global matrix on one host.
"""

from __future__ import annotations

import numpy as np

from parallel_amg_tpu.ops.coo import COO


def _poisson_nd(dims, row_range=None, dtype=np.float64) -> COO:
    """N-dimensional (2N+1)-point Laplacian with Dirichlet boundaries.

    Row i couples to i±stride_d with weight -1 and to itself with weight 2N.
    Grid points are numbered lexicographically (last dim fastest).
    """
    dims = tuple(int(d) for d in dims)
    n = int(np.prod(dims))
    lo, hi = (0, n) if row_range is None else (int(row_range[0]), int(row_range[1]))
    rows_1d = np.arange(lo, hi, dtype=np.int64)
    # unravel to grid coordinates
    coords = np.stack(np.unravel_index(rows_1d, dims), axis=0)  # (ndim, m)
    strides = np.array(
        [int(np.prod(dims[d + 1 :])) for d in range(len(dims))], dtype=np.int64
    )

    rs, cs, vs = [], [], []
    # diagonal
    rs.append(rows_1d)
    cs.append(rows_1d)
    vs.append(np.full(rows_1d.shape, 2.0 * len(dims), dtype=dtype))
    for d in range(len(dims)):
        for sgn in (-1, 1):
            ok = (
                (coords[d] + sgn >= 0) & (coords[d] + sgn < dims[d])
            )
            r = rows_1d[ok]
            rs.append(r)
            cs.append(r + sgn * strides[d])
            vs.append(np.full(r.shape, -1.0, dtype=dtype))
    return COO(
        np.concatenate(rs), np.concatenate(cs), np.concatenate(vs), (n, n)
    )


def poisson2d(nx: int, ny: int | None = None, row_range=None, dtype=np.float64) -> COO:
    """2D 5-point Poisson on an nx×ny grid (BASELINE.json:7,8)."""
    ny = ny or nx
    return _poisson_nd((nx, ny), row_range=row_range, dtype=dtype)


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None,
              row_range=None, dtype=np.float64) -> COO:
    """3D 7-point Poisson on an nx×ny×nz grid (BASELINE.json:9,11)."""
    ny = ny or nx
    nz = nz or nx
    return _poisson_nd((nx, ny, nz), row_range=row_range, dtype=dtype)
