"""Distributed containers and communication (L2/L3 — SURVEY.md §2.1, §2.6).

Design (TPU-native re-imagining of PartitionedArrays' PRange/PVector/
PSparseMatrix + Exchanger stack, SURVEY.md §1 L2-L3):

- A 1D device mesh over axis ``"rows"``; every global vector is a plain
  ``(n_padded,)`` jnp array with ``NamedSharding(P("rows"))`` — elementwise
  ops and reductions partition automatically (dots become psum).
- :class:`PCSR` is the row-partitioned sparse matrix: per-shard own/ghost
  split-block ELL storage plus a static all-to-all halo plan.  Its matvec is
  a ``shard_map`` kernel: gather send windows → ``lax.all_to_all`` →
  ghost-gather → fused diag+offdiag SpMV.
- The "debug backend" is the same program on a CPU mesh
  (``--xla_force_host_platform_device_count=N``) — no code changes.
"""

from parallel_amg_tpu.parallel.partition import Partition, uniform_row_partition
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.parallel.mesh import make_row_mesh
from parallel_amg_tpu.parallel.pvector import pvector, to_global, dot, norm

__all__ = [
    "Partition",
    "uniform_row_partition",
    "PCSR",
    "make_row_mesh",
    "pvector",
    "to_global",
    "dot",
    "norm",
]
