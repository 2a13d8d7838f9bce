"""Distributed COO→PCSR assembly — the ``psparse`` analog (SURVEY.md §3.4).

Triplets may reference any (i, j), including rows owned by other shards and
duplicate entries (finite-element assembly semantics): duplicates sum, and
off-owner contributions are routed to the owning shard.  In this
single-controller runtime the routing/dedup runs on host numpy at setup
time (the sort-based path of COO.to_csr); the frozen PCSR then carries the
static halo plans for the solve phase.
"""

from __future__ import annotations

import numpy as np

from parallel_amg_tpu.ops.coo import COO
from parallel_amg_tpu.parallel.partition import Partition
from parallel_amg_tpu.parallel.pcsr import PCSR


def pcsr_from_coo(rows, cols, vals, shape, mesh,
                  col_partition: Partition | None = None,
                  dtype=None, pad_identity: bool = True) -> PCSR:
    """Assemble a distributed PCSR from (i, j, v) triplets.

    Mirrors PartitionedArrays' ``psparse`` surface: duplicate and off-owner
    entries are legal and are summed at the owning row.
    """
    coo = COO(np.asarray(rows), np.asarray(cols), np.asarray(vals),
              tuple(shape))
    csr = coo.to_csr()
    import jax.numpy as jnp

    return PCSR.from_csr(csr, mesh, col_partition=col_partition,
                         dtype=dtype or jnp.float32,
                         pad_identity=pad_identity)
