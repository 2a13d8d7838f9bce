"""Block (vector-PDE) operators: Kronecker stencils and grid-layout BSR.

Multi-DOF nodes are the BSR workload of the spec (BASELINE.json:5,11 "BSR
blocks").  The canonical generator here is the coupled vector Laplacian
A = L ⊗ C (scalar stencil L on the node grid, SPD bs×bs coupling C) —
each grid node carries ``bs`` unknowns and every stored matrix entry is a
dense bs×bs block.

TPU-native design ("unknown-based" systems AMG, the standard structured
choice): transfers are P_s ⊗ I with the SCALAR-smoothed prolongator, so
every Galerkin coarse operator stays exactly L_c ⊗ C — the hierarchy is
the scalar hierarchy Kronecker the coupling.  The FINE level is stored and
applied as true block-ELL :class:`~parallel_amg_tpu.ops.bsr.BSR` (the
spec's mandated storage; einsum SpMV = batched 3×3 block matmuls), coarse
levels as :class:`BlockStencil` (scalar planes + one C mix — no index
traffic at all).

Vectors are (*node_dims, bs) grids throughout (node-major, component-minor
= the Kronecker row order); the hierarchy converts at the API boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.ops.stencil import Stencil


@jax.tree_util.register_pytree_node_class
class BlockStencil:
    """A = L ⊗ C: scalar stencil planes + a constant bs×bs coupling block.

    weights: (D, *dims) scalar planes (same convention as Stencil);
    C: (bs, bs) dense coupling.  matvec on (*dims, bs) grids is one scalar
    multi-RHS stencil pass (Stencil.matmat over the component axis) followed
    by the C mix — zero per-entry index traffic, the structured fast path
    for coarse vector levels.
    """

    def __init__(self, weights, offsets, dims, C):
        self.weights = weights
        self.offsets = tuple(tuple(int(c) for c in o) for o in offsets)
        self.node_dims = tuple(int(d) for d in dims)
        self.C = C

    def tree_flatten(self):
        return (self.weights, self.C), (self.offsets, self.node_dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        weights, C = children
        offsets, dims = aux
        return cls(weights, offsets, dims, C)

    # -- properties ---------------------------------------------------------
    @property
    def bs(self) -> int:
        return int(self.C.shape[0])

    @property
    def dims(self):
        """Grid layout of vectors this operator consumes/produces."""
        return self.node_dims + (self.bs,)

    @property
    def n_nodes(self) -> int:
        return int(np.prod(self.node_dims))

    @property
    def n_rows(self) -> int:
        return self.n_nodes * self.bs

    @property
    def shape(self):
        return (self.n_rows, self.n_rows)

    @property
    def n_points(self) -> int:
        return len(self.offsets)

    @property
    def nnz(self):
        return jnp.sum(self.weights != 0) * jnp.sum(self.C != 0)

    def scalar(self) -> Stencil:
        """The scalar factor L (shares the weight planes)."""
        return Stencil(self.weights, self.offsets, self.node_dims)

    # -- device ops ----------------------------------------------------------
    def matvec(self, x):
        """y = (L ⊗ C) x for x of shape (*node_dims, bs)."""
        z = self.scalar().matmat(x)          # (…, bs): L per component
        return jnp.einsum("...j,ij->...i", z, self.C)

    def diagonal(self):
        """(*node_dims, bs) grid of diag(L)_p · diag(C)_i."""
        dL = self.scalar().diagonal()
        return dL[..., None] * jnp.diagonal(self.C)[
            (None,) * len(self.node_dims)]

    def to_csr(self):
        import scipy.sparse as sp

        from parallel_amg_tpu.ops.csr import CSR

        L = self.scalar().to_csr().to_scipy()
        return CSR.from_scipy(sp.kron(L, np.asarray(self.C)).tocsr())

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_pytree_node_class
class BSRGridOperator:
    """Grid-layout adapter over a block-ELL BSR matrix.

    Stores the fine-level operator in the spec-mandated BSR format
    (BASELINE.json:5) while speaking the structured path's (*node_dims, bs)
    grid protocol — the reshape is free (node-major component-minor grid
    layout IS the BSR element order).
    """

    def __init__(self, bsr, node_dims):
        self.bsr = bsr
        self.node_dims = tuple(int(d) for d in node_dims)

    def tree_flatten(self):
        return (self.bsr,), (self.node_dims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def bs(self) -> int:
        return self.bsr.bs

    @property
    def dims(self):
        return self.node_dims + (self.bs,)

    @property
    def n_rows(self) -> int:
        return self.bsr.shape[0]

    @property
    def shape(self):
        return self.bsr.shape

    @property
    def nnz(self):
        return self.bsr.nnz

    def matvec(self, x):
        y = self.bsr.matvec(x.reshape(-1))
        return y.reshape(x.shape)

    def diagonal(self):
        return self.bsr.diagonal().reshape(self.dims)

    def __matmul__(self, x):
        return self.matvec(x)


def bsr_from_kron_stencil(L: Stencil, C, dtype=jnp.float32):
    """Device-born block-ELL BSR of A = L ⊗ C — no host nnz loop.

    Block row p (flat node id) has one slot per stencil offset:
    bcols[p, d] = flat(p + off_d) (0 where the neighbor leaves the grid —
    its value block is zero there since L's planes already encode the
    boundary), vals[p, d] = W_d(p) · C.
    """
    from parallel_amg_tpu.ops.bsr import BSR

    dims = L.dims
    nd = len(dims)
    n = int(np.prod(dims))
    D = L.n_points
    bs = int(np.asarray(C).shape[0])
    C = jnp.asarray(C, dtype)

    def build(W):
        coords = [jax.lax.broadcasted_iota(jnp.int32, dims, i)
                  for i in range(nd)]
        bcols = []
        ws = []
        for d, off in enumerate(L.offsets):
            nbr = [coords[i] + off[i] for i in range(nd)]
            ok = jnp.ones(dims, bool)
            flat = jnp.zeros(dims, jnp.int32)
            stride = 1
            for i in reversed(range(nd)):
                ok = ok & (nbr[i] >= 0) & (nbr[i] < dims[i])
                flat = flat + nbr[i].astype(jnp.int32) * stride
                stride *= dims[i]
            ws.append(jnp.where(ok, W[d], 0.0).reshape(n))
            bcols.append(jnp.where(ok, flat, 0).reshape(n))
        # the value planes are n·D·bs²·4 B (8.6 GB at 324³×7×3²): emit them
        # as individual 1-D scalar planes w_d · C_ij — the BSR storage
        # convention (ops/bsr.py module doc) — so no rank-4 tensor (and no
        # tiled-layout relayout copy) ever exists
        vals = tuple((ws[d] * C[i, j]).astype(dtype)
                     for d in range(D) for i in range(bs) for j in range(bs))
        return jnp.stack(bcols, axis=1), vals

    bcols, vals = jax.jit(build)(L.weights)
    brow_nnz = jnp.full((n,), D, jnp.int32)
    return BSR(bcols, vals, brow_nnz, (n * bs, n * bs), bs)


# ---------------------------------------------------------------------------
# vector (⊗ I) transfer operators — the scalar block transfers applied
# per component, so P = P_s ⊗ I and the Galerkin hierarchy stays Kronecker
# ---------------------------------------------------------------------------

from parallel_amg_tpu.amg.transfers import upsample_nd


@jax.tree_util.register_pytree_node_class
class VectorBlockProlongator:
    """(P_s ⊗ I) @ xc with P_s = (I − coef·D_L⁻¹L) T_s on the node grid.

    Carries its own scalar planes (L, d_inv_L) when the level's operator is
    BSR (which cannot yield its scalar factor); links to a BlockStencil
    level otherwise.
    """

    def __init__(self, L, d_inv_L, scale, coef, dims, cdims, block, bs):
        self.L = L              # Stencil or None (linked)
        self.d_inv_L = d_inv_L  # (*node_dims,) or None
        self.scale = scale      # (*cdims,)
        self.coef = coef
        self.node_dims = tuple(dims)
        self.cdims = tuple(cdims)
        self.block = int(block)
        self.bs = int(bs)

    def tree_flatten(self):
        return ((self.L, self.d_inv_L, self.scale, self.coef),
                (self.node_dims, self.cdims, self.block, self.bs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def linked(self) -> bool:
        return self.L is None

    def _scalar(self, A):
        if self.L is not None:
            return self.L, self.d_inv_L
        L = A.scalar()
        dL = L.diagonal()
        return L, jnp.where(dL != 0, 1.0 / dL, 0.0)

    @property
    def shape(self):
        return (int(np.prod(self.node_dims)) * self.bs,
                int(np.prod(self.cdims)) * self.bs)

    def zeros_coarse(self, dtype):
        return jnp.zeros(self.cdims + (self.bs,), dtype)

    def matvec(self, xc):
        return self.matvec_linked(None, None, xc)

    def matvec_linked(self, A, d_inv, xc):
        L, dL = self._scalar(A)
        t = upsample_nd(xc * self.scale[..., None], self.node_dims,
                        self.block)
        return t - self.coef * (dL[..., None] * L.matmat(t))


@jax.tree_util.register_pytree_node_class
class VectorBlockRestrictor:
    """(R_s ⊗ I) @ r = scale · pool(r − coef·L(D_L⁻¹ r)) per component."""

    def __init__(self, L, d_inv_L, scale, coef, dims, cdims, block, bs):
        self.L = L
        self.d_inv_L = d_inv_L
        self.scale = scale
        self.coef = coef
        self.node_dims = tuple(dims)
        self.cdims = tuple(cdims)
        self.block = int(block)
        self.bs = int(bs)

    def tree_flatten(self):
        return ((self.L, self.d_inv_L, self.scale, self.coef),
                (self.node_dims, self.cdims, self.block, self.bs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def linked(self) -> bool:
        return self.L is None

    def _scalar(self, A):
        if self.L is not None:
            return self.L, self.d_inv_L
        L = A.scalar()
        dL = L.diagonal()
        return L, jnp.where(dL != 0, 1.0 / dL, 0.0)

    @property
    def shape(self):
        return (int(np.prod(self.cdims)) * self.bs,
                int(np.prod(self.node_dims)) * self.bs)

    def matvec(self, r):
        return self.matvec_linked(None, None, r)

    def matvec_linked(self, A, d_inv, r):
        L, dL = self._scalar(A)
        s = r - self.coef * L.matmat(dL[..., None] * r)
        return self.scale[..., None] * _pool_nodes(s, self.cdims, self.block)


def _pool_nodes(y, cdims, block):
    """Sum-pool the node axes of a (*node_dims, bs) grid (components kept)."""
    nd = len(cdims)
    pad = [(0, cdims[i] * block - y.shape[i]) for i in range(nd)] + [(0, 0)]
    yp = jnp.pad(y, pad)
    return jax.lax.reduce_window(
        yp, jnp.zeros((), y.dtype), jax.lax.add,
        (block,) * nd + (1,), (block,) * nd + (1,), "VALID",
    )
