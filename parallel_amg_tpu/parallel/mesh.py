"""Device mesh construction and multi-controller bring-up (SURVEY.md §3.5).

The reference's ``MPI.Init`` analog: one controller per host calls
``jax.distributed.initialize`` (multi-host), then every process builds the
same global 1D mesh over the row-partition axis.
"""

from __future__ import annotations

import jax
import numpy as np

ROW_AXIS = "rows"


def runtime_init(coordinator_address: str | None = None,
                 num_processes: int | None = None,
                 process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op in single-process runs).

    Mirrors MPI.Init in the reference stack (SURVEY.md §2.1 "Distributed
    init"); under a pod slice each host calls this before building meshes.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_row_mesh(n_devices: int | None = None) -> jax.sharding.Mesh:
    """1D mesh over all (or the first n) devices, axis name "rows"."""
    devices = np.array(jax.devices() if n_devices is None
                       else jax.devices()[:n_devices])
    return jax.sharding.Mesh(devices, (ROW_AXIS,))


def row_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Sharding for global row-partitioned vectors: P('rows') on axis 0."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(ROW_AXIS)
    )


def replicated_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
