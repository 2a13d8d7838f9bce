"""Distributed vectors — the PVector analog (SURVEY.md §2.1).

A distributed vector here is simply a global jnp array of padded length
S·m with ``NamedSharding(P("rows"))``: elementwise ops, axpy, dot and norm
are ordinary jnp calls that the XLA partitioner turns into local compute +
psum.  These helpers handle the host↔device boundary (padding, sharding,
unpadding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.parallel.mesh import row_sharding
from parallel_amg_tpu.parallel.partition import Partition


def pvector(x_host, partition: Partition, mesh, dtype=jnp.float32):
    """Pad a host (n_global,) vector to (n_padded,) and shard it."""
    x_host = np.asarray(x_host)
    pad = partition.n_padded - x_host.shape[0]
    if pad:
        x_host = np.concatenate([x_host, np.zeros((pad,), x_host.dtype)])
    return jax.device_put(jnp.asarray(x_host, dtype=dtype), row_sharding(mesh))


def to_global(x, partition: Partition) -> np.ndarray:
    """Fetch a sharded padded vector to host and strip padding."""
    return np.asarray(x)[: partition.n_global]


def dot(x, y):
    """Distributed dot product (psum under the hood)."""
    return jnp.vdot(x, y)


def norm(x):
    return jnp.linalg.norm(x)
