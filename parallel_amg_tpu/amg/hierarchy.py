"""AMG hierarchy: per-level operator pytrees + setup driver.

The hierarchy is the static backbone of the jitted solve path: a Python list
of :class:`Level` pytrees (so depth and all array shapes are fixed at trace
time) plus a replicated dense Cholesky factor for the coarsest level
(SURVEY.md §2.3 "Hierarchy builder", "Coarse solve").
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL


@jax.tree_util.register_pytree_node_class
class Level:
    """One multigrid level: A (and transfer ops to the next-coarser level).

    ``P``/``R`` are ``None`` on the coarsest level.  ``lam_max`` is the
    λ_max(D⁻¹A) estimate used by Chebyshev smoothing (0.0 when unused) —
    a traced scalar so re-setup does not retrigger compilation.

    ``true_n`` (static aux, optional): the LOGICAL row count when the level
    operator is padded (sharded grids pad axis 0; PCSR pads to S·m) —
    complexity diagnostics must count true rows, not padding
    (SURVEY.md §4.5(c)).
    """

    def __init__(self, A: ELL, P: Optional[ELL], R: Optional[ELL],
                 d_inv, lam_max, true_n: Optional[int] = None):
        self.A = A
        self.P = P
        self.R = R
        self.d_inv = d_inv
        self.lam_max = lam_max
        self.true_n = int(true_n) if true_n is not None else None

    def tree_flatten(self):
        return ((self.A, self.P, self.R, self.d_inv, self.lam_max),
                self.true_n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, true_n=aux)

    @property
    def n(self) -> int:
        """Logical (unpadded) row count of this level."""
        if self.true_n is not None:
            return self.true_n
        ts = getattr(self.A, "true_shape", None)
        return ts[0] if ts is not None else self.A.n_rows


def coarse_inverse(dense, rel_tol: float = 1e-6):
    """Dense coarse-level solve operator M⁻¹ via symmetric eigh.

    Repeated sparsify/lump rounds can leave the coarsest operator slightly
    indefinite (observed λ_min ≈ −4%·λ_max on 128³ block-SA), where ridge +
    Cholesky NaNs.  The eigendecomposition pseudo-inverse zeroes the
    non-positive modes, and applying a precomputed dense M⁻¹ is one matmul
    on the MXU instead of two sequential triangular solves.
    """
    S = 0.5 * (dense + dense.T)
    w, V = jnp.linalg.eigh(S)
    wmax = jnp.max(jnp.abs(w))
    good = w > rel_tol * wmax
    winv = jnp.where(good, 1.0 / jnp.where(good, w, 1.0), 0.0)
    return (V * winv[None, :]) @ V.T


def coarse_inverse_np(dense, rel_tol: float = 1e-6):
    """Host (numpy, f64) variant of :func:`coarse_inverse`."""
    S = 0.5 * (dense + dense.T)
    w, V = np.linalg.eigh(S)
    wmax = np.max(np.abs(w)) if w.size else 1.0
    winv = np.where(w > rel_tol * wmax, 1.0 / np.where(w > rel_tol * wmax, w, 1.0), 0.0)
    return (V * winv[None, :]) @ V.T


@jax.tree_util.register_pytree_node_class
class Hierarchy:
    """Full AMG hierarchy. A pytree; ``config`` is static aux data."""

    def __init__(self, levels: List[Level], coarse_inv, config: AMGConfig):
        self.levels = levels
        # Dense solve operator M⁻¹ for the coarsest-level matrix (eigh
        # pseudo-inverse — see coarse_inverse).
        self.coarse_inv = coarse_inv
        self.config = config

    def tree_flatten(self):
        return (self.levels, self.coarse_inv), self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        levels, coarse_inv = children
        return cls(levels, coarse_inv, config)

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    def complexity(self):
        """(grid_complexity, operator_complexity) — host-side diagnostics.

        Counts TRUE rows/nnz: padded rows (sharded axis-0 padding, PCSR
        S·m alignment) carry one identity entry each, so both counts
        subtract the padding contribution (SURVEY.md §4.5(c) asks for
        grid/operator complexity < ~2.5 on the acceptance configs).
        """
        rows = [l.n for l in self.levels]
        nnz = []
        for l in self.levels:
            pad = l.A.shape[0] - l.n  # identity padding rows
            nnz.append(int(np.asarray(l.A.nnz)) - max(pad, 0))
        return sum(rows) / rows[0], sum(nnz) / nnz[0]

    # -- structured-path shape adapters ----------------------------------
    @property
    def grid_dims(self):
        """Level-0 grid dims when the hierarchy is stencil-structured."""
        return getattr(self.levels[0].A, "dims", None)

    def to_grid(self, v):
        """User-facing 1D vector → internal layout (N-D on the structured
        path; identity otherwise)."""
        dims = self.grid_dims
        if dims is not None and v.ndim == 1:
            return v.reshape(dims)
        return v

    def from_grid(self, v):
        """Internal layout → user-facing 1D vector."""
        return v.reshape(-1) if v.ndim > 1 else v


def with_spmv_backend(h: "Hierarchy", backend: str = "mixed") -> "Hierarchy":
    """Swap the level operators' SpMV engine after setup.

    backend="pallas" converts every Stencil level operator to the FlatDIA
    streaming Pallas kernel (ops/flatdia.py); backend="xla" converts FlatDIA
    levels back to the N-D Stencil XLA path; backend="mixed" picks per level
    by the measured crossover: the XLA N-D path wins on big thin-stencil
    levels (its single fused pass reads x once: 78 µs vs 53 µs at 128³
    7-point, and it wins outright at ≥256³), while the one-kernel FlatDIA
    stream crushes fat coarse stencils where XLA emits one pad+slice+FMA
    fusion per plane (full 128³ b=3 V-cycle: 1495 µs all-XLA → 713 µs
    mixed, measured on v5e).  Transfer operators and smoother data are
    untouched (both formats accept/return N-D grid vectors).
    """
    from parallel_amg_tpu.ops.flatdia import FlatDIA
    from parallel_amg_tpu.ops.stencil import Stencil

    def want_pallas(A) -> bool:
        if backend == "pallas":
            return True
        if backend == "xla":
            return False
        # mixed: fat stencils only.  Thin-stencil levels stay XLA even
        # though an ISOLATED FlatDIA SpMV beats XLA at 128³ 7-pt (53 vs
        # 78 µs): inside the cycle XLA fuses the smoother's elementwise
        # chain into its stencil pass, which a Pallas call boundary forfeits
        # (all-pallas 1015 µs vs mixed 713 µs, measured).  Never on CPU-mesh
        # test runs, where the interpreter path is orders slower than XLA.
        if jax.default_backend() != "tpu":
            return False
        return getattr(A, "n_points", 0) >= 9

    def convert(A):
        if isinstance(A, Stencil) and want_pallas(A):
            return FlatDIA.from_stencil(A)
        if (isinstance(A, FlatDIA) and not want_pallas(A) and A.dims
                and A.nd_offsets is not None):
            W = A.diags[:, : A.n].reshape((A.n_points,) + A.dims)
            return Stencil(W, A.nd_offsets, A.dims)
        return A

    levels = [Level(A=convert(l.A), P=l.P, R=l.R, d_inv=l.d_inv,
                    lam_max=l.lam_max, true_n=l.true_n) for l in h.levels]
    return Hierarchy(levels, h.coarse_inv, h.config)


def with_best_formats(h: "Hierarchy", target_backend: str = "tpu",
                      device: bool = False) -> "Hierarchy":
    """Convert ELL level operators (A, P, R) to the fastest solve formats
    for ``target_backend``: DIA for banded square operators, TWELL (the
    Pallas within-tile-gather kernel) for everything else on TPU.

    The algebraic setup paths (device_rs/device_sa) compute in padded ELL
    planes; the SOLVE path pays XLA's serialized gather for every ELL
    matvec on TPU (~0.1 Gnnz/s — ops/twell.py) unless converted.

    ``device=False``: host-side numpy build — pulls every plane to host,
    which costs ~90 s through the remote-TPU tunnel at RS-1024² (round-4
    measurement).  ``device=True``: on-device build (ops/format_device.py) —
    only scalar sizes cross the tunnel; same format policy, operator-equal
    output (layout differs; see that module's doc).  Keep the un-converted
    hierarchy for float64 paths (TWELL is f32-only).
    """
    from parallel_amg_tpu.ops.dia import DIA
    from parallel_amg_tpu.ops.twell import TWELL

    if device:
        from parallel_amg_tpu.ops.format_device import best_format_from_ell

        def conv(T):
            return best_format_from_ell(T, target_backend)

        levels = [Level(conv(l.A), conv(l.P), conv(l.R), l.d_inv, l.lam_max,
                        true_n=l.true_n) for l in h.levels]
        return Hierarchy(levels, h.coarse_inv, h.config)

    def conv(T):
        if not isinstance(T, ELL):
            return T
        csr = T.to_csr()
        n_rows, n_cols = csr.shape
        if n_rows == n_cols:
            dia = DIA.from_csr(csr, max_diags=192)
            if dia is not None:
                fill = csr.nnz / max(dia.n_diags * n_rows, 1)
                if fill > 0.15 or dia.n_diags <= 32:
                    return dia
        if target_backend == "tpu":
            return TWELL.from_csr(csr)
        return T

    levels = [Level(conv(l.A), conv(l.P), conv(l.R), l.d_inv, l.lam_max,
                    true_n=l.true_n) for l in h.levels]
    return Hierarchy(levels, h.coarse_inv, h.config)


# ---------------------------------------------------------------------------
# Setup driver
# ---------------------------------------------------------------------------

def setup(A, config: AMGConfig = AMGConfig(), dtype=jnp.float32,
          seed: int = 0, dims=None) -> Hierarchy:
    """Build an AMG hierarchy from a host CSR (or COO/scipy) matrix.

    dims: optional grid dimensions of the row space — enables the
    structured aggregate="block" SA fast path (all-DIA hierarchy with
    reshape-based transfers).

    Backend selection per ``config.on_device_setup``:
    - False → host numpy setup (oracle algorithms), frozen to device arrays.
    - True  → on-device jnp setup (amg.device_setup).
    """
    if config.on_device_setup:
        from parallel_amg_tpu.amg.device_setup import device_structured_setup
        from parallel_amg_tpu.ops.stencil import Stencil

        if isinstance(A, Stencil):
            return device_structured_setup(A, config, dtype=dtype, seed=seed)
        if (dims is not None and config.coarsening == "sa"
                and config.aggregate == "block"):
            if isinstance(A, CSR):
                csr = A
            elif hasattr(A, "to_csr"):
                csr = A.to_csr()
            else:
                csr = CSR.from_scipy(A)
            st = Stencil.from_csr(csr, dims, dtype=dtype)
            if st is None:
                raise ValueError("matrix is not stencil-structured on dims")
            return device_structured_setup(st, config, dtype=dtype, seed=seed)
        if config.coarsening == "rs":
            from parallel_amg_tpu.amg.device_rs import device_rs_setup

            return device_rs_setup(A, config, dtype=dtype, seed=seed)
        # algebraic SA: MIS aggregation + smoothed tentative P on device
        from parallel_amg_tpu.amg.device_sa import device_sa_setup

        return device_sa_setup(A, config, dtype=dtype, seed=seed)
    return host_setup(A, config, dtype=dtype, seed=seed, dims=dims)


def host_setup(A, config: AMGConfig, dtype=jnp.float32, seed: int = 0,
               dims=None) -> Hierarchy:
    """Host (numpy, float64) setup → static-shape device hierarchy.

    Runs the serial reference algorithms (oracle module), then freezes each
    level into the fastest device representation (ops/select.py): DIA for
    banded operators, TWELL/ELL otherwise; structured-SA levels get
    reshape-based BlockProlongator/BlockRestrictor transfers instead of
    sparse P/R (SURVEY.md §1 L5/L6).
    """
    from parallel_amg_tpu.amg.transfers import BlockProlongator, BlockRestrictor
    from parallel_amg_tpu.ops.select import best_format
    from parallel_amg_tpu.ops.stencil import Stencil
    from parallel_amg_tpu.oracle.serial_amg import oracle_setup

    if isinstance(A, CSR):
        A_sp = A.to_scipy()
    elif hasattr(A, "to_csr"):  # COO
        A_sp = A.to_csr().to_scipy()
    else:
        A_sp = A  # assume scipy sparse / dense
    oh = oracle_setup(A_sp, config, seed=seed, dims=dims)

    # dims per level (structured path): level i's grid = previous cdims
    level_dims: List = []
    cur = tuple(dims) if dims is not None else None
    for ol in oh.levels:
        level_dims.append(ol.dims if ol.dims is not None else cur)
        cur = ol.cdims if ol.cdims is not None else None

    levels: List[Level] = []
    n_levels = len(oh.levels)
    for i, ol in enumerate(oh.levels):
        structured = (
            config.coarsening == "sa" and config.aggregate == "block"
            and level_dims[i] is not None
        )
        csr_A = CSR.from_scipy(ol.A)
        A_dev = None
        if structured:
            A_dev = Stencil.from_csr(csr_A, level_dims[i], dtype=dtype)
            if A_dev is None:
                # stencil blow-up: truncate the hierarchy here (this level
                # becomes the dense-solved coarsest level)
                n_levels = i + 1
        if A_dev is None:
            A_dev = best_format(csr_A, dtype=dtype)
        d_inv = jnp.asarray(ol.d_inv, dtype=dtype)
        if isinstance(A_dev, Stencil):
            d_inv = d_inv.reshape(A_dev.dims)
        lam = jnp.asarray(ol.lam_max, dtype=dtype)
        P_dev = R_dev = None
        if ol.P is not None and i + 1 < n_levels:
            if isinstance(A_dev, Stencil) and ol.dims is not None:
                # structured SA level: gather-free N-D reshape transfers
                coef = jnp.asarray(
                    config.sa_omega / max(ol.lam_max, 1e-30), dtype=dtype
                )
                scale = jnp.asarray(ol.agg_scale, dtype=dtype).reshape(ol.cdims)
                P_dev = BlockProlongator(None, None, scale, coef,
                                         ol.dims, ol.cdims, config.block_size)
                R_dev = BlockRestrictor(None, None, scale, coef,
                                        ol.dims, ol.cdims, config.block_size)
            else:
                P_dev = best_format(CSR.from_scipy(ol.P), dtype=dtype)
                R_dev = best_format(CSR.from_scipy(ol.R), dtype=dtype)
        levels.append(Level(A=A_dev, P=P_dev, R=R_dev, d_inv=d_inv,
                            lam_max=lam))
        if i + 1 == n_levels:
            break
    levels = levels[:n_levels]
    # Solve operator in f32 even when the cycle runs in a lower precision
    # (the coarse level is tiny).
    coarse_inv = jnp.asarray(
        coarse_inverse_np(oh.levels[n_levels - 1].A.toarray()), jnp.float32
    )
    return Hierarchy(levels, coarse_inv, config)
