"""Multi-host (pod-slice) helpers.

Single-host multi-device execution needs nothing beyond a Mesh; on a real
multi-host pod slice each process sees only its local chips and must (a)
initialize the distributed runtime and (b) assemble globally-sharded arrays
from process-local shards.  These helpers wrap the standard JAX recipe.

Untestable in this environment (one chip, one host) — kept deliberately thin
over stable public APIs, with the single-host paths exercised by the test
suite (``global_batch`` degenerates to ``device_put`` under one process).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the JAX distributed runtime (no-op if single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names=("data",), shape=None) -> Mesh:
    """Mesh over *all* devices across hosts (jax.devices() is global)."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))


def global_batch(local_batch: np.ndarray, mesh: Mesh, axis: str = "data"):
    """Assemble a globally batch-sharded array from each process's local
    shard (every process passes its own rows; the global batch is their
    concatenation in process order)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)
