"""Native (C++) host-runtime tier — setup-phase builders behind ctypes.

The reference stack's native code is third-party C under Julia (MPI, BLAS,
SuiteSparse — SURVEY.md §2.7).  This framework keeps the device compute
path in XLA/Pallas and implements its *host* runtime hot spots natively:
the O(nnz) CSR-partition scans of ``PCSR.from_csr`` live in
``pcsr_builder.cpp`` (OpenMP over shards) and are loaded here through
ctypes — no pybind11 dependency.  Everything degrades gracefully: if no
C++ toolchain is present the callers fall back to the numpy reference
implementation, which stays the correctness oracle in tests.

The shared library is compiled once per source hash into
``~/.cache/parallel_amg_tpu/`` (or $TMPDIR when HOME is read-only).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "pcsr_builder.cpp")
_lib = None
_tried = False


def _cache_dir() -> str:
    base = os.environ.get("PARALLEL_AMG_NATIVE_CACHE")
    if not base:
        home = os.path.expanduser("~")
        base = os.path.join(
            home if os.access(home, os.W_OK) else tempfile.gettempdir(),
            ".cache", "parallel_amg_tpu")
    os.makedirs(base, exist_ok=True)
    return base


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libamgnative-{tag}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
           "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, out)
    return out


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PARALLEL_AMG_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.pcsr_analyze.restype = ctypes.c_int
    lib.pcsr_analyze.argtypes = [i64p, i64p, i64, i64, i64, i64,
                                 i32p, i32p, i64p, i64p, i64]
    lib.pcsr_fill.restype = ctypes.c_int
    lib.pcsr_fill.argtypes = [i64p, i64p, f64p, i64, i64, i64, i64,
                              ctypes.c_int32, ctypes.c_int32, i64p, i64p,
                              i32p, f64p, i32p, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native builder compiled and loaded on this host."""
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pcsr_partition(indptr, indices, data, n_rows, S, m, mc):
    """Partition a CSR matrix into per-shard own/ghost padded ELL blocks.

    Returns (diag_cols, diag_vals, off_cols, off_vals, ghost_sets) with the
    exact semantics of the numpy path in ``PCSR.from_csr`` (minus identity
    padding rows, which the caller appends), or None when the native
    library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    nnz = int(indices.shape[0])
    Wd = ctypes.c_int32(0)
    Wo = ctypes.c_int32(0)
    ghost_off = np.zeros(S + 1, dtype=np.int64)
    ghost_buf = np.empty(max(nnz, 1), dtype=np.int64)
    rc = lib.pcsr_analyze(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        n_rows, S, m, mc, ctypes.byref(Wd), ctypes.byref(Wo),
        _ptr(ghost_off, ctypes.c_int64), _ptr(ghost_buf, ctypes.c_int64),
        ghost_buf.shape[0])
    if rc != 0:
        return None
    Wd = max(int(Wd.value), 1)
    Wo = max(int(Wo.value), 1)
    diag_cols = np.zeros((S, m, Wd), dtype=np.int32)
    diag_vals = np.zeros((S, m, Wd), dtype=np.float64)
    off_cols = np.zeros((S, m, Wo), dtype=np.int32)
    off_vals = np.zeros((S, m, Wo), dtype=np.float64)
    rc = lib.pcsr_fill(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), n_rows, S, m, mc, Wd, Wo,
        _ptr(ghost_off, ctypes.c_int64), _ptr(ghost_buf, ctypes.c_int64),
        _ptr(diag_cols, ctypes.c_int32), _ptr(diag_vals, ctypes.c_double),
        _ptr(off_cols, ctypes.c_int32), _ptr(off_vals, ctypes.c_double))
    if rc != 0:
        return None
    ghost_sets = [ghost_buf[ghost_off[s]:ghost_off[s + 1]].copy()
                  for s in range(S)]
    return diag_cols, diag_vals, off_cols, off_vals, ghost_sets
