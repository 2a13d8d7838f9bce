"""Serial numpy/scipy AMG oracle (SURVEY.md §2.8 "Reference oracle").

The reference snapshot contains no runnable numerics (SURVEY.md §0), so this
module *is* the operative reference implementation: a trusted, serial,
float64 classical-AMG / smoothed-aggregation solver whose iteration counts
and residual histories define "reference convergence" for the acceptance
configs (BASELINE.json:7-11).  It is deliberately written in plain
numpy/scipy with no JAX, so it shares no code with the device path it
validates.
"""

from parallel_amg_tpu.oracle.serial_amg import (
    OracleHierarchy,
    oracle_setup,
    oracle_vcycle,
    oracle_solve,
    oracle_pcg,
)

__all__ = [
    "OracleHierarchy",
    "oracle_setup",
    "oracle_vcycle",
    "oracle_solve",
    "oracle_pcg",
]
