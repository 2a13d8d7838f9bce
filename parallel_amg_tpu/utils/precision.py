"""Mixed-precision helpers — the 1e-8 convergence path (BASELINE.json:5).

f32 dot products floor the measurable relative residual near ~1e-7 at the
acceptance scales, so "iteration counts to 1e-8" cannot be honored (or even
*measured*) in pure f32: the f32 recursive CG residual keeps shrinking below
the true residual (Greenbaum), silently over-reporting convergence.  The
TPU-native answer is a mixed-precision Krylov layer: f64 vectors, reductions
and operator applications (XLA:TPU emulates f64 elementwise ops — only the
O(n) Krylov work pays it) over the f32/bf16 AMG hierarchy, whose V-cycle is
a preconditioner and needs no precision at all.

``x64_scope`` flips ``jax_enable_x64`` for the duration of a trace+call;
traces made inside the scope are cached under the x64 key, so mixing scoped
f64 solves with f32 programs in one process is safe.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def x64_scope(enable: bool = True):
    """Temporarily enable 64-bit types (tracing inside sees f64)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", enable)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)
