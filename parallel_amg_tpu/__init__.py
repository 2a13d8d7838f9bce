"""parallel_amg_tpu — a TPU-native algebraic multigrid (AMG) framework.

A brand-new JAX/Pallas implementation of distributed algebraic multigrid with
the capability surface of ``tirtho109/parallel_AMG`` (parallel AMG on top of
PartitionedArrays.jl — see /root/reference/README.md:2).  Nothing here is a
port: the reference declares *what* (row-partitioned sparse containers, ghost
exchange, AMG setup/solve, MPI-style SPMD); this package re-designs all of it
TPU-first:

- SPMD over a ``jax.sharding.Mesh`` with ``shard_map`` (the MPI analog),
- halo exchange via XLA collectives (``ppermute`` / ``all_to_all``),
- static-shape padded sparse formats (CSR/COO/ELL/BSR/DIA) so everything jits,
- Pallas kernels for the bandwidth-bound hot ops,
- fully-jitted V/W-cycles and Krylov solvers (``lax.while_loop``).

Layer map (SURVEY.md §1): ops (L4) → amg (L5/L6) → krylov (L7) → problems (L8),
with parallel (L2/L3) underneath everything.
"""

__version__ = "0.1.0"

from parallel_amg_tpu.config import AMGConfig, SolveConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.coo import COO
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.amg import setup, vcycle, solve, Hierarchy
from parallel_amg_tpu.solver import amg_pcg, amg_pcg_mp, amg_fgmres

__all__ = [
    "AMGConfig",
    "SolveConfig",
    "CSR",
    "COO",
    "ELL",
    "setup",
    "vcycle",
    "solve",
    "Hierarchy",
    "amg_pcg",
    "amg_pcg_mp",
    "amg_fgmres",
]
