"""Distributed hierarchy setup: freeze a hierarchy into PCSR levels.

The resulting :class:`~parallel_amg_tpu.amg.hierarchy.Hierarchy` contains
PCSR operators and sharded vectors, and runs through the *same* jitted
cycle/CG code as the single-device ELL path — the "same program on any
backend" property the reference inherits from PartitionedArrays
(SURVEY.md §1 L1), realized here by format polymorphism over ``.matvec``.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.parallel.mesh import replicated_sharding, row_sharding
from parallel_amg_tpu.parallel.partition import uniform_row_partition
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.parallel.pvector import pvector


@jax.tree_util.register_pytree_node_class
class ReshardedTransfer:
    """Transfer operator that crosses the sharded↔replicated boundary.

    Wraps a small replicated operator (ELL/TWELL/DIA) and pins its output
    layout with ``with_sharding_constraint`` — GSPMD inserts the one
    all-gather (restriction: sharded fine residual → replicated coarse rhs)
    or keeps the row-partitioned output local (prolongation: replicated
    coarse correction → sharded fine update).  This is the entire
    communication cost of an agglomerated sub-hierarchy.
    """

    def __init__(self, T, mesh, out: str):
        self.T = T
        self.mesh = mesh
        self.out = out  # "replicated" | "rows"

    def tree_flatten(self):
        return (self.T,), (self.mesh, self.out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def shape(self):
        return self.T.shape

    def matvec(self, v):
        sh = (replicated_sharding(self.mesh) if self.out == "replicated"
              else row_sharding(self.mesh))
        return jax.lax.with_sharding_constraint(self.T.matvec(v), sh)

    def __matmul__(self, v):
        return self.matvec(v)


def _replicate_pytree(x, mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep) if hasattr(a, "dtype") else a, x)


def with_neighbor_plans(h: Hierarchy) -> Hierarchy:
    """Switch every PCSR operator in the hierarchy to the neighbor-wise
    ppermute exchange plan (PCSR.with_neighbor_plan) — halo bytes scale
    with actual neighbor count instead of the dense S×C all_to_all."""
    def conv(T):
        return T.with_neighbor_plan() if isinstance(T, PCSR) else T

    levels = [Level(conv(l.A), conv(l.P), conv(l.R), l.d_inv, l.lam_max,
                    true_n=l.true_n) for l in h.levels]
    return Hierarchy(levels, h.coarse_inv, h.config)


def distributed_setup(A, config: AMGConfig, mesh, dtype=jnp.float32,
                      seed: int = 0) -> Hierarchy:
    """Host setup (serial reference algorithms) → distributed PCSR hierarchy.

    Per level: A as square PCSR (identity padding), P/R as rectangular PCSR
    between the fine and coarse row partitions, D⁻¹ as a sharded vector.

    Levels with ≤ ``config.agglomerate_n`` rows are **agglomerated**: their
    operators are replicated on every device and the sub-hierarchy below the
    boundary runs as identical plain single-device programs per shard —
    zero collectives per coarse matvec, one all-gather at the boundary
    restriction (the redundant coarse solve / re-partitioning of
    SURVEY.md §2.1, §7 hard-part 6, taken to every sufficiently small
    level rather than only the coarsest).
    """
    # fully on-device distributed setups — no host-global matrix anywhere in
    # their call graphs (VERDICT r2 item 3 / r3 item 5): RS and algebraic SA
    # both run under shard_map; only explicit host-setup requests
    # (on_device_setup=False) still route through the serial oracle below.
    if config.on_device_setup:
        if config.coarsening == "rs":
            from parallel_amg_tpu.parallel.prs_setup import distributed_rs_setup

            setup_fn = distributed_rs_setup
        else:
            from parallel_amg_tpu.parallel.psa_setup import distributed_sa_setup

            setup_fn = distributed_sa_setup
        A_p = A if isinstance(A, PCSR) else PCSR.from_csr(
            A.to_scipy() if isinstance(A, CSR)
            else (A.to_csr().to_scipy() if hasattr(A, "to_csr") else A),
            mesh, dtype=dtype)
        return with_neighbor_plans(
            setup_fn(A_p, config, dtype=dtype, seed=seed))

    from parallel_amg_tpu.oracle.serial_amg import oracle_setup

    if isinstance(A, CSR):
        A_sp = A.to_scipy()
    elif hasattr(A, "to_csr"):
        A_sp = A.to_csr().to_scipy()
    else:
        A_sp = A
    oh = oracle_setup(A_sp, config, seed=seed)
    S = mesh.devices.size

    # first agglomerated level (never the finest)
    n_levels = len(oh.levels)
    agg = n_levels
    if config.agglomerate_n:
        for i in range(1, n_levels):
            if oh.levels[i].A.shape[0] <= config.agglomerate_n:
                agg = i
                break

    from parallel_amg_tpu.ops.select import best_format
    import scipy.sparse as sp

    levels: List[Level] = []
    parts = [uniform_row_partition(l.A.shape[0], S) for l in oh.levels]
    for i, ol in enumerate(oh.levels):
        part = parts[i]
        if i >= agg:
            # replicated level: plain single-device operators, identical
            # compute on every shard
            A_r = _replicate_pytree(
                best_format(CSR.from_scipy(ol.A.tocsr()), dtype=dtype), mesh)
            P_r = R_r = None
            if ol.P is not None and i + 1 < n_levels:
                P_r = _replicate_pytree(
                    best_format(CSR.from_scipy(ol.P.tocsr()), dtype=dtype),
                    mesh)
                R_r = _replicate_pytree(
                    best_format(CSR.from_scipy(ol.R.tocsr()), dtype=dtype),
                    mesh)
            levels.append(Level(
                A=A_r, P=P_r, R=R_r,
                d_inv=jax.device_put(jnp.asarray(ol.d_inv, dtype=dtype),
                                     replicated_sharding(mesh)),
                lam_max=jnp.asarray(ol.lam_max, dtype=dtype),
            ))
            continue
        A_p = PCSR.from_csr(ol.A.tocsr(), mesh, dtype=dtype, pad_identity=True)
        P_p = R_p = None
        if ol.P is not None:
            if i + 1 == agg:
                # boundary transfers: sharded fine ↔ replicated coarse.
                # P gets zero rows appended up to the padded fine length so
                # its output aligns with the sharded padded vectors.
                n_f, n_c = ol.P.shape
                P_pad = sp.vstack([
                    ol.P.tocsr(),
                    sp.csr_matrix((part.n_padded - n_f, n_c)),
                ]).tocsr()
                P_p = ReshardedTransfer(
                    _replicate_pytree(best_format(CSR.from_scipy(P_pad),
                                                  dtype=dtype), mesh),
                    mesh, out="rows")
                R_p = ReshardedTransfer(
                    _replicate_pytree(best_format(
                        CSR.from_scipy(ol.R.tocsr()), dtype=dtype), mesh),
                    mesh, out="replicated")
            else:
                coarse_part = parts[i + 1]
                P_p = PCSR.from_csr(ol.P.tocsr(), mesh,
                                    col_partition=coarse_part,
                                    dtype=dtype, pad_identity=False)
                R_p = PCSR.from_csr(ol.R.tocsr(), mesh, col_partition=part,
                                    dtype=dtype, pad_identity=False)
        # D⁻¹ with pad rows = 1 (identity pad rows keep smoothers inert)
        d_inv = np.ones((part.n_padded,), dtype=np.float64)
        d_inv[: part.n_global] = ol.d_inv
        levels.append(
            Level(
                A=A_p,
                P=P_p,
                R=R_p,
                d_inv=pvector(d_inv, part, mesh, dtype=dtype),
                lam_max=jnp.asarray(ol.lam_max, dtype=dtype),
            )
        )
    # replicated dense coarse solve operator (padded space only when the
    # coarsest level is still sharded)
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    if agg < n_levels:
        dense = oh.levels[-1].A.toarray()
    else:
        cpart = parts[-1]
        dense = np.eye(cpart.n_padded, dtype=np.float64)
        dense[: cpart.n_global, : cpart.n_global] = oh.levels[-1].A.toarray()
    coarse_inv = jax.device_put(
        jnp.asarray(coarse_inverse_np(dense), dtype=jnp.float32),
        replicated_sharding(mesh),
    )
    return with_neighbor_plans(Hierarchy(levels, coarse_inv, config))
