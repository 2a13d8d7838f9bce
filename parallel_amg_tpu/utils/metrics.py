"""Run metrics and logging (SURVEY.md §5 "Metrics / logging").

- ``rank0_print``: multi-host console guard (only process 0 speaks —
  the pattern of SNIPPETS.md:96-100).
- ``RunRecord``: structured per-run JSON (iters, residual history,
  per-level timings, GB/s) feeding the benchmark tables.
- ``residual_history``: extraction helper for solver results (histories are
  inf-padded device arrays).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import numpy as np


def rank0_print(*args, **kwargs):
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs, flush=True)


def residual_history(hist) -> np.ndarray:
    """Strip the inf padding from a solver residual-history array."""
    h = np.asarray(hist)
    return h[np.isfinite(h)]


@dataclasses.dataclass
class RunRecord:
    name: str
    n: int
    config: dict
    iters: Optional[int] = None
    converged: Optional[bool] = None
    residuals: Optional[list] = None
    setup_s: Optional[float] = None
    solve_s: Optional[float] = None
    per_level: Optional[list] = None  # [{n, nnz, format, spmv_s, gbps}, ...]
    extra: Optional[dict] = None
    timestamp: float = dataclasses.field(default_factory=time.time)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        if d.get("residuals") is not None:
            d["residuals"] = [float(x) for x in d["residuals"]]
        return json.dumps(d)

    def save(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(self.to_json() + "\n")


def hierarchy_summary(h) -> list:
    """Per-level {n, nnz, format} table for a Hierarchy."""
    out = []
    for l in h.levels:
        out.append({
            "n": int(l.A.n_rows),
            "nnz": int(np.asarray(l.A.nnz)),
            "format": type(l.A).__name__,
        })
    return out
