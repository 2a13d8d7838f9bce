"""FlatDIA — flattened-diagonal storage with a streaming Pallas SpMV/SpMM.

The Pallas counterpart of the XLA N-D Stencil path (BASELINE.json:5
"SpMV/SpMM ... kernels written in Pallas").  Any stencil/banded operator
flattens to ``y[r] = Σ_d W[d, r] · x[r + off_d]`` with 1-D offsets
``off = Σ_i o_i · stride_i`` and W zeroed wherever the N-D neighbor falls
outside the grid — so the flattened form is *exact*, including boundaries.

Kernel design (measured on v5e, see tests/test_flatdia.py for parity):
- grid over row tiles; the weight block ``(D, tile)`` and output ``(tile,)``
  ride Pallas' automatic pipeline (double-buffered HBM→VMEM DMA);
- x windows overlap between tiles (halo = max|off| each side), which
  BlockSpec strides cannot express — so x stays in ANY/HBM and the kernel
  double-buffers ``tile + lo + hi`` windows with explicit ``make_async_copy``
  into two VMEM scratch buffers (static slot branches: Mosaic cannot
  dynamically index the buffer dimension of a VMEM scratch);
- per offset the shifted read is a *static* 1-D VMEM slice — no gathers.

Measured 128³ 7-point f32: ~53 µs/SpMV vs ~81 µs for the XLA N-D path
(1.5×); the XLA path wins again at ≥256³ where its single fused pass
reads x exactly once.  Format selection is measured, not guessed — see
``amg.hierarchy`` backend autotune.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024  # tile granularity: keep windows sublane/lane friendly


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def default_tile(n: int, n_diags: int, dtype_bytes: int = 4) -> int:
    """Row-tile size: ~n/64 (double-buffer win, measured) within VMEM."""
    t = 1 << max(13, int(np.log2(max(n, 1) / 64.0) + 0.5))
    t = min(t, 131072)
    # VMEM: 2·D·tile·b (W pipeline) + 2·wlen·4 (x windows) + 2·tile·4 (y)
    while t > _LANES and (2 * n_diags * t * dtype_bytes + 4 * t * 4) > 10 * 2**20:
        t //= 2
    return max(t, _LANES)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=64)
def _build_spmv(offsets, n_pad, tile, w_dtype, x_dtype, interpret):
    """Compile-cached pallas_call for one (offsets, shape, dtype) class."""
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    # DMA slice lengths must be lane-tile (1024) aligned on TPU; the x
    # buffer carries extra tail padding so windows can over-read safely.
    wlen = _round_up(tile + lo + hi, _LANES)
    grid = n_pad // tile
    D = len(offsets)
    w_dtype = jnp.dtype(w_dtype)
    x_dtype = jnp.dtype(x_dtype)

    def kernel(x_ref, w_ref, y_ref, xwin0, xwin1, sem):
        i = pl.program_id(0)
        bufs = (xwin0, xwin1)

        def dma(slot, step):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(step * tile, wlen)], bufs[slot], sem.at[slot]
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        def start_next(slot):
            @pl.when((i + 1 < grid) & ((i + 1) % 2 == slot))
            def _():
                dma(slot, i + 1).start()

        start_next(0)
        start_next(1)

        def compute(slot):
            @pl.when(i % 2 == slot)
            def _():
                dma(slot, i).wait()
                win = bufs[slot][:]
                acc = jnp.zeros((tile,), jnp.float32)
                for d, o in enumerate(offsets):
                    wd = w_ref[d].astype(jnp.float32)
                    acc = acc + wd * jax.lax.slice(
                        win, (lo + o,), (lo + o + tile,)
                    ).astype(jnp.float32)
                y_ref[:] = acc.astype(x_dtype)

        compute(0)
        compute(1)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((D, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x_dtype),
        scratch_shapes=[
            pltpu.VMEM((wlen,), x_dtype),
            pltpu.VMEM((wlen,), x_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=64)
def _build_spmm(offsets, n_pad, tile, k, w_dtype, x_dtype, interpret):
    """SpMM variant on the TRANSPOSED RHS: windows are (k, wlen) slabs so
    the offset shifts ride the lane dimension exactly like the SpMV kernel
    (the (wlen, k) sublane-shift layout crashed the Mosaic compiler)."""
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    wlen = _round_up(tile + lo + hi, _LANES)
    grid = n_pad // tile
    D = len(offsets)
    x_dtype = jnp.dtype(x_dtype)

    def kernel(x_ref, w_ref, y_ref, xwin0, xwin1, sem):
        i = pl.program_id(0)
        bufs = (xwin0, xwin1)

        def dma(slot, step):
            return pltpu.make_async_copy(
                x_ref.at[:, pl.ds(step * tile, wlen)], bufs[slot], sem.at[slot]
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        def start_next(slot):
            @pl.when((i + 1 < grid) & ((i + 1) % 2 == slot))
            def _():
                dma(slot, i + 1).start()

        start_next(0)
        start_next(1)

        def compute(slot):
            @pl.when(i % 2 == slot)
            def _():
                dma(slot, i).wait()
                win = bufs[slot][:]
                acc = jnp.zeros((k, tile), jnp.float32)
                for d, o in enumerate(offsets):
                    wd = w_ref[d].astype(jnp.float32)
                    acc = acc + wd[None, :] * jax.lax.slice(
                        win, (0, lo + o), (k, lo + o + tile)
                    ).astype(jnp.float32)
                y_ref[:] = acc.astype(x_dtype)

        compute(0)
        compute(1)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((D, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), x_dtype),
        scratch_shapes=[
            pltpu.VMEM((k, wlen), x_dtype),
            pltpu.VMEM((k, wlen), x_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )


def dia_spmv(diags_pad, offsets, x, n: int):
    """Functional kernel API: y = A@x from pre-padded (D, n_pad) diagonals.

    diags_pad rows are A's flattened diagonals zero-padded to n_pad (a
    multiple of the tile); x is the unpadded (n,) vector.
    """
    offsets = tuple(int(o) for o in offsets)
    n_pad = diags_pad.shape[1]
    tile = _infer_tile(n_pad, len(offsets), diags_pad.dtype.itemsize)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    wlen = _round_up(tile + lo + hi, _LANES)
    xp = jnp.zeros((n_pad - tile + wlen,), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (lo,))
    fn = _build_spmv(offsets, n_pad, tile, str(diags_pad.dtype),
                     str(x.dtype), _use_interpret())
    return fn(xp, diags_pad)[:n]


def dia_spmm(diags_pad, offsets, X, n: int):
    """Y = A @ X for dense (n, k) X — multi-RHS streaming SpMM."""
    offsets = tuple(int(o) for o in offsets)
    n_pad = diags_pad.shape[1]
    k = int(X.shape[1])
    kp = _round_up(k, 8)  # sublane-aligned RHS count
    tile = _infer_tile(n_pad, len(offsets), diags_pad.dtype.itemsize,
                       k=kp)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    wlen = _round_up(tile + lo + hi, _LANES)
    Xp = jnp.zeros((kp, n_pad - tile + wlen), X.dtype)
    Xp = jax.lax.dynamic_update_slice(Xp, X.T, (0, lo))
    fn = _build_spmm(offsets, n_pad, tile, kp, str(diags_pad.dtype),
                     str(X.dtype), _use_interpret())
    return fn(Xp, diags_pad)[:k, :n].T


def _infer_tile(n_pad, n_diags, w_bytes, k: int = 1):
    """Largest default tile that divides n_pad (n_pad is pre-padded to a
    multiple of the construction-time tile, so this recovers it)."""
    t = default_tile(n_pad, n_diags, w_bytes)
    # x/y slabs scale with k
    while t > _LANES and (2 * n_diags * t * w_bytes + 4 * t * 4 * k) > 10 * 2**20:
        t //= 2
    while n_pad % t:
        t //= 2
    return max(t, 1)


@jax.tree_util.register_pytree_node_class
class FlatDIA:
    """Flattened-diagonal operator with Pallas streaming matvec.

    Drop-in for Stencil on the structured path: accepts/returns N-D grid
    vectors when ``dims`` is set (reshape is free), 1-D otherwise.

    Attributes:
      diags: (D, n_pad) — flattened diagonals, zero-padded rows ≥ n.
      offsets: static tuple of 1-D (flattened) integer offsets.
      n: logical size; dims: optional static grid shape (prod == n).
    """

    def __init__(self, diags, offsets, n, dims=None, nd_offsets=None):
        self.diags = diags
        self.offsets = tuple(int(o) for o in offsets)
        self.n = int(n)
        self.dims = tuple(int(d) for d in dims) if dims is not None else None
        # original N-D offsets (for exact back-conversion to Stencil);
        # None when unknown or when flattening merged aliased planes.
        self.nd_offsets = nd_offsets

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.n, self.dims,
                               self.nd_offsets)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, n, dims, nd_offsets = aux
        return cls(children[0], offsets, n, dims, nd_offsets)

    # -- properties -------------------------------------------------------
    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_rows(self) -> int:
        return self.n

    @property
    def n_points(self) -> int:
        return len(self.offsets)

    @property
    def nnz(self):
        return jnp.sum(self.diags != 0)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_stencil(cls, st, dtype=None):
        """Flatten an N-D Stencil (ops/stencil.py): offsets o → Σ o_i·s_i.

        Distinct N-D offsets may alias one 1-D offset on tiny grids; aliased
        planes sum (both contribute to the same flattened diagonal).
        """
        dims = st.dims
        strides = np.cumprod((dims[1:] + (1,))[::-1])[::-1]
        off1d = np.asarray(
            [int(np.dot(o, strides)) for o in st.offsets], np.int64)
        uoff, inv = np.unique(off1d, return_inverse=True)
        W = st.weights.reshape(st.n_points, -1)
        if dtype is not None:
            W = W.astype(dtype)
        if len(uoff) != len(off1d):
            W = jax.ops.segment_sum(W, jnp.asarray(inv), len(uoff))
        n = st.n
        tile = default_tile(n, len(uoff), W.dtype.itemsize)
        n_pad = -(-n // tile) * tile
        if n_pad != n:
            W = jnp.pad(W, ((0, 0), (0, n_pad - n)))
        # nd_offsets in uoff (sorted-flat) order — inv is a permutation
        # exactly when no planes aliased
        nd_offsets = (tuple(st.offsets[i] for i in np.argsort(inv))
                      if len(uoff) == len(off1d) else None)
        return cls(W, tuple(int(o) for o in uoff), n, dims, nd_offsets)

    @classmethod
    def from_dia(cls, dia, dtype=None):
        """From a 1-D DIA (ops/dia.py) — same banded layout, Pallas engine."""
        W = dia.diags if dtype is None else dia.diags.astype(dtype)
        n = dia.n_rows
        tile = default_tile(n, dia.n_diags, W.dtype.itemsize)
        n_pad = -(-n // tile) * tile
        if n_pad != n:
            W = jnp.pad(W, ((0, 0), (0, n_pad - n)))
        return cls(W, dia.offsets, n, None)

    # -- device ops --------------------------------------------------------
    def matvec(self, x):
        y = dia_spmv(self.diags, self.offsets, x.reshape(-1), self.n)
        return y.reshape(x.shape)

    def matmat(self, X):
        """Multi-RHS product; X is (*grid_or_n, k)."""
        k = X.shape[-1]
        Y = dia_spmm(self.diags, self.offsets, X.reshape(-1, k), self.n)
        return Y.reshape(X.shape)

    def diagonal(self):
        if 0 in self.offsets:
            d = self.diags[self.offsets.index(0), : self.n]
        else:
            d = jnp.zeros((self.n,), self.diags.dtype)
        return d.reshape(self.dims) if self.dims else d

    def scale_rows(self, s):
        sp = s.reshape(-1)
        if sp.shape[0] != self.diags.shape[1]:
            sp = jnp.pad(sp, (0, self.diags.shape[1] - sp.shape[0]))
        return FlatDIA(self.diags * sp[None], self.offsets, self.n,
                       self.dims, self.nd_offsets)

    def __matmul__(self, x):
        return self.matvec(x)
