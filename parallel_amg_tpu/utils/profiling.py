"""Profiling and debug helpers (SURVEY.md §5).

- ``trace(path)``: jax.profiler trace context for setup/cycle phases —
  open the result in XProf/TensorBoard.
- ``check_finite(tree, name)``: NaN/Inf guard for debug builds (the
  checkify-style sanitizer; cheap enough to leave in setup paths).
- ``debug_mode()``: context that forces Pallas interpret mode so TWELL &
  friends run under the Python interpreter for kernel-logic debugging.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/prof'): solver(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_finite(tree, name: str = "value") -> None:
    """Host-sync NaN/Inf check over every leaf of a pytree (debug builds)."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            bad = int(jnp.sum(~jnp.isfinite(leaf)))
            if bad:
                raise FloatingPointError(
                    f"{name}: leaf {i} has {bad} non-finite entries"
                )


@contextlib.contextmanager
def debug_mode():
    """Force Pallas interpret mode within the context (kernel debugging)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
