"""Sharded stencil operators — the distributed structured fast path.

Domain decomposition along grid axis 0 over the 1D "rows" mesh: each shard
owns a contiguous slab of m0 grid planes.  SpMV needs only the h boundary
planes of each neighbor (h = max |offset₀| — the ghost/halo surface,
SURVEY.md §2.5 "halo exchange"), exchanged with two ``lax.ppermute`` shifts
inside the shard_map kernel; the interior stencil compute is local pad +
N-D dynamic slices, identical to ops/stencil.py.

Transfers stay *entirely local*: the grid is padded so every shard owns a
whole number of aggregation blocks, making block-repeat upsampling and
sum-pool downsampling shard-local (no communication in P/R at all — the
reference stack's ghost exchange for transfer operators disappears by
layout choice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.parallel.mesh import ROW_AXIS, row_sharding


def _halo_exchange(xl, h):
    """Fetch h top planes from the left neighbor and h bottom planes from
    the right neighbor along axis 0 (zero planes at the domain boundary).

    xl: (m0, *rest) local slab inside shard_map.  Returns (m0+2h, *rest).
    """
    S = jax.lax.axis_size(ROW_AXIS)
    idx = jax.lax.axis_index(ROW_AXIS)
    zeros = jnp.zeros((h,) + xl.shape[1:], xl.dtype)
    if S == 1:
        return jnp.concatenate([zeros, xl, zeros], axis=0)
    # my top h planes -> right neighbor's left halo
    top = xl[-h:]
    left_halo = jax.lax.ppermute(
        top, ROW_AXIS, [(i, i + 1) for i in range(S - 1)]
    )
    left_halo = jnp.where(idx == 0, 0.0, left_halo)
    # my bottom h planes -> left neighbor's right halo
    bottom = xl[:h]
    right_halo = jax.lax.ppermute(
        bottom, ROW_AXIS, [(i + 1, i) for i in range(S - 1)]
    )
    right_halo = jnp.where(idx == S - 1, 0.0, right_halo)
    return jnp.concatenate([left_halo, xl, right_halo], axis=0)


@jax.tree_util.register_pytree_node_class
class ShardedStencil:
    """Stencil operator on a grid sharded along axis 0.

    weights: (D, d0p, *rest) with d0p = S·m0 (padded), sharded on axis 1.
    Padding planes carry an identity diagonal so smoothers stay inert there.
    """

    def __init__(self, weights, offsets, dims, mesh):
        self.weights = weights
        self.offsets = tuple(tuple(int(c) for c in o) for o in offsets)
        self.dims = tuple(int(d) for d in dims)  # padded global dims
        self.mesh = mesh

    def tree_flatten(self):
        return (self.weights,), (self.offsets, self.dims, self.mesh)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, dims, mesh = aux
        return cls(children[0], offsets, dims, mesh)

    # -- properties -------------------------------------------------------
    @property
    def n(self) -> int:
        return int(np.prod(self.dims))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_rows(self) -> int:
        return self.n

    @property
    def nnz(self):
        return jnp.sum(self.weights != 0)

    @property
    def halo(self) -> int:
        return max(max(abs(o[0]) for o in self.offsets), 0)

    # -- construction -----------------------------------------------------
    @classmethod
    def from_stencil(cls, st, mesh, dtype=None):
        """Shard a host-built Stencil: pad axis 0 to S·m0 (identity planes),
        shard the weight planes."""
        S = mesh.devices.size
        d0 = st.dims[0]
        m0 = -(-d0 // S)
        d0p = S * m0
        W = np.asarray(st.weights)
        pad = [(0, 0), (0, d0p - d0)] + [(0, 0)] * (len(st.dims) - 1)
        Wp = np.pad(W, pad)
        zero_off = tuple(0 for _ in st.dims)
        if zero_off in st.offsets:
            d_idx = st.offsets.index(zero_off)
            Wp[d_idx, d0:] = 1.0  # identity diagonal on padding planes
        dims = (d0p,) + st.dims[1:]
        sharding = jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS))
        weights = jax.device_put(
            jnp.asarray(Wp, dtype=dtype or st.weights.dtype), sharding
        )
        return cls(weights, st.offsets, dims, mesh)

    # -- distributed matvec ------------------------------------------------
    def matvec(self, x):
        """y = A @ x for a globally-sharded N-D grid x (axis 0 on 'rows')."""
        h = self.halo
        offsets = self.offsets
        dims = self.dims
        nd = len(dims)

        def kernel(W, xl):
            xh = _halo_exchange(xl, h) if h else xl
            # pad the non-sharded axes; axis 0 already has halo planes
            pads = [(0, 0)] + [
                (max(0, -min(o[i] for o in offsets)),
                 max(0, max(o[i] for o in offsets)))
                for i in range(1, nd)
            ]
            xp = jnp.pad(xh, pads)
            y = jnp.zeros_like(xl)
            local = xl.shape
            for d, off in enumerate(offsets):
                start = (h + off[0],) + tuple(
                    pads[i][0] + off[i] for i in range(1, nd)
                )
                y = y + W[d] * jax.lax.dynamic_slice(xp, start, local)
            return y

        return jax.shard_map(
            kernel,
            mesh=self.mesh,
            in_specs=(P(None, ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )(self.weights, x)

    def diagonal(self):
        zero = tuple(0 for _ in self.dims)
        if zero in self.offsets:
            return self.weights[self.offsets.index(zero)]
        return jnp.zeros(self.dims, self.weights.dtype)

    def __matmul__(self, x):
        return self.matvec(x)
