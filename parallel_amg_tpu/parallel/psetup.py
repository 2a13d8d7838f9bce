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


def distributed_setup(A, config: AMGConfig, mesh, dtype=jnp.float32,
                      seed: int = 0) -> Hierarchy:
    """Host setup (serial reference algorithms) → distributed PCSR hierarchy.

    Per level: A as square PCSR (identity padding), P/R as rectangular PCSR
    between the fine and coarse row partitions, D⁻¹ as a sharded vector.
    The coarsest level is agglomerated: its padded dense matrix (identity on
    pad rows) is Cholesky-factored and replicated on every device —
    the redundant-coarse-solve pattern (SURVEY.md §7 hard-part 6).
    """
    from parallel_amg_tpu.oracle.serial_amg import oracle_setup

    if isinstance(A, CSR):
        A_sp = A.to_scipy()
    elif hasattr(A, "to_csr"):
        A_sp = A.to_csr().to_scipy()
    else:
        A_sp = A
    oh = oracle_setup(A_sp, config, seed=seed)
    S = mesh.devices.size

    levels: List[Level] = []
    parts = [uniform_row_partition(l.A.shape[0], S) for l in oh.levels]
    for i, ol in enumerate(oh.levels):
        part = parts[i]
        A_p = PCSR.from_csr(ol.A.tocsr(), mesh, dtype=dtype, pad_identity=True)
        P_p = R_p = None
        if ol.P is not None:
            coarse_part = parts[i + 1]
            P_p = PCSR.from_csr(ol.P.tocsr(), mesh, col_partition=coarse_part,
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
    # replicated dense coarse solve operator over the padded coarse space
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    cpart = parts[-1]
    dense = np.eye(cpart.n_padded, dtype=np.float64)
    dense[: cpart.n_global, : cpart.n_global] = oh.levels[-1].A.toarray()
    coarse_inv = jax.device_put(
        jnp.asarray(coarse_inverse_np(dense), dtype=jnp.float32),
        replicated_sharding(mesh),
    )
    return Hierarchy(levels, coarse_inv, config)
