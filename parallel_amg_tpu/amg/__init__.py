"""AMG setup (L5) and solve (L6) layers — SURVEY.md §2.3, §2.4.

``setup`` builds a :class:`Hierarchy` (a pytree of per-level operators in ELL
form plus a dense coarse factorization); ``vcycle``/``solve`` run the fully
jitted multigrid cycles.  Two setup backends:

- ``host``: serial numpy setup (wraps the trusted oracle algorithms), then
  freezes the hierarchy into static-shape device arrays.  This is the
  Phase-1/2 path (SURVEY.md §7).
- ``device``: jnp/Pallas on-device setup — strength, PMIS, interpolation and
  Galerkin SpGEMM executed on the accelerator (SURVEY.md §7 Phase 3).
"""

from parallel_amg_tpu.amg.hierarchy import Level, Hierarchy, setup
from parallel_amg_tpu.amg.cycle import vcycle, solve
from parallel_amg_tpu.amg import smoothers

__all__ = ["Level", "Hierarchy", "setup", "vcycle", "solve", "smoothers"]
