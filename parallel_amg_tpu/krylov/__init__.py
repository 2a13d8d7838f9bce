"""Krylov solvers (L7): AMG-preconditioned CG / flexible GMRES.

The reference stack's Krylov layer is the IterativeSolvers.jl/Krylov.jl
pattern over PartitionedArrays containers (SURVEY.md §1 L7); here the solvers
are jnp programs over any operator exposing ``matvec`` — single-device ELL or
distributed PCSR — with reductions that become ``psum`` under shard_map.
"""

from parallel_amg_tpu.krylov.cg import cg
from parallel_amg_tpu.krylov.gmres import fgmres

__all__ = ["cg", "fgmres"]
