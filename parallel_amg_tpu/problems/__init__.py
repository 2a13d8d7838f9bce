"""Model problem generators (SURVEY.md §2.8, layer L8).

These build the acceptance-benchmark matrices of BASELINE.json:7-11:
2D 5-point / 3D 7-point Poisson and 2D anisotropic diffusion, as host COO/CSR
(global build) or per-shard (never materializing the global matrix — used by
the multi-host ≥100M-DOF config).
"""

from parallel_amg_tpu.problems.poisson import poisson2d, poisson3d
from parallel_amg_tpu.problems.anisotropic import anisotropic2d
from parallel_amg_tpu.problems.convection import convection2d

__all__ = ["poisson2d", "poisson3d", "anisotropic2d", "convection2d"]
