"""Test-session config: run everything on a virtual 8-device CPU mesh.

This is the framework's `with_debug` analog (SURVEY.md §4.3): the identical
shard_map programs run on N fake devices in one process, so distributed
semantics are tested without a cluster.  Must run before jax initializes.
"""

import os

# Force CPU: the harness presets JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on the virtual device mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f64 in tests: the numpy oracle is f64; device path is f32 — tests compare
# with appropriate tolerances, but keep x64 available for oracle parity runs.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# wins platform selection; override explicitly after import.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU-mesh test programs: the suite is
# compile-bound (same shapes recompile on every run), and caching every
# executable (threshold 0) cuts repeat-run wall time several-fold
# (VERDICT r2 weak #8: the suite must stay cheap enough to actually run).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".bench_cache",
                 "xla_cpu_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import tempfile  # noqa: E402

# Hermetic RS shape-schedule store: without this, fused-driver tests would
# record schedules in the user's ~/.cache and REPLAY them on the next suite
# run, silently changing which code path the tests exercise.
os.environ.setdefault(
    "PAT_RS_SCHEDULE_DIR",
    tempfile.mkdtemp(prefix="pat_rs_sched_tests_"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
