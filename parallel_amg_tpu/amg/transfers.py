"""Structured SA transfer operators — N-D, reshape/pool-based, gather-free.

For aggregate="block" levels the tentative prolongator T is block-injection
on a regular grid, so T@x is repeat-upsampling and Tᵀ@y is sum-pooling
(``lax.reduce_window`` — TPU's optimized pooling path), and the smoothed
transfers

    P = (I − (ω/λ) D⁻¹A) T        R = Pᵀ = Tᵀ (I − (ω/λ) A D⁻¹)

need only the level's Stencil operator A.  Everything stays in N-D grid
layout: composing these with the stencil matvec keeps XLA's fusions
vectorized (the 1D-flattened formulation measured ~50× slower — see
ops/stencil.py).  These classes expose ``matvec``/``shape``/``zeros_coarse``
so the jitted cycle code is representation-oblivious.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nd(xc, dims, block):
    """T₀ @ xc: block-repeat each axis, crop to the fine dims."""
    g = xc
    for ax in range(len(dims)):
        g = jnp.repeat(g, block, axis=ax)
    return g[tuple(slice(0, d) for d in dims)]


def downsample_sum_nd(y, cdims, block):
    """T₀ᵀ @ y: zero-pad to whole blocks, then sum-pool (reduce_window)."""
    nd = y.ndim
    pad = [(0, cdims[i] * block - y.shape[i]) for i in range(nd)]
    yp = jnp.pad(y, pad)
    return jax.lax.reduce_window(
        yp, jnp.zeros((), y.dtype), jax.lax.add,
        (block,) * nd, (block,) * nd, "VALID",
    )


@jax.tree_util.register_pytree_node_class
class BlockProlongator:
    """P @ xc = (I − (ω/λ) D⁻¹ A) upsample(xc · scale); N-D in/out.

    Pass A=None/d_inv=None to build a LINKED transfer that borrows the
    level's operator at apply time (``matvec_linked``) instead of carrying
    its own copy — otherwise the hierarchy pytree holds the fine operator
    three times (Level.A, P.A, R.A) and jit relayout-copies each arg
    separately (observed 3×3.08 GB at 110M DOF).
    """

    def __init__(self, A, d_inv, scale, coef, dims, cdims, block):
        self.A = A            # the level's Stencil operator (or None)
        self.d_inv = d_inv    # (*dims,) (or None when linked)
        self.scale = scale    # (*cdims,) tentative column norms 1/√|agg|
        self.coef = coef      # traced scalar ω/λ_max
        self.dims = tuple(dims)
        self.cdims = tuple(cdims)
        self.block = int(block)

    def tree_flatten(self):
        return ((self.A, self.d_inv, self.scale, self.coef),
                (self.dims, self.cdims, self.block))

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, d_inv, scale, coef = children
        dims, cdims, block = aux
        return cls(A, d_inv, scale, coef, dims, cdims, block)

    @property
    def linked(self) -> bool:
        return self.A is None

    @property
    def shape(self):
        return (int(np.prod(self.dims)), int(np.prod(self.cdims)))

    def zeros_coarse(self, dtype):
        return jnp.zeros(self.cdims, dtype)

    def matvec(self, xc):
        return self.matvec_linked(self.A, self.d_inv, xc)

    def matvec_linked(self, A, d_inv, xc):
        t = upsample_nd(xc * self.scale, self.dims, self.block)
        return t - self.coef * (d_inv * A.matvec(t))


@jax.tree_util.register_pytree_node_class
class BlockRestrictor:
    """R @ r = scale · downsample_sum(r − (ω/λ) A (D⁻¹ r)); N-D in/out.

    Supports the same linked (A=None) mode as BlockProlongator.
    """

    def __init__(self, A, d_inv, scale, coef, dims, cdims, block):
        self.A = A
        self.d_inv = d_inv
        self.scale = scale
        self.coef = coef
        self.dims = tuple(dims)
        self.cdims = tuple(cdims)
        self.block = int(block)

    def tree_flatten(self):
        return ((self.A, self.d_inv, self.scale, self.coef),
                (self.dims, self.cdims, self.block))

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, d_inv, scale, coef = children
        dims, cdims, block = aux
        return cls(A, d_inv, scale, coef, dims, cdims, block)

    @property
    def linked(self) -> bool:
        return self.A is None

    @property
    def shape(self):
        return (int(np.prod(self.cdims)), int(np.prod(self.dims)))

    def matvec(self, r):
        return self.matvec_linked(self.A, self.d_inv, r)

    def matvec_linked(self, A, d_inv, r):
        s = r - self.coef * A.matvec(d_inv * r)
        return self.scale * downsample_sum_nd(s, self.cdims, self.block)
