"""Multi-host (pod-slice) helpers.

Single-host multi-device execution needs nothing beyond a Mesh; on a real
multi-host pod slice each process sees only its local chips and must (a)
initialize the distributed runtime and (b) assemble globally-sharded arrays
from process-local shards.  These helpers wrap the standard JAX recipe.

Tested for real: tests/test_multihost.py spawns two OS processes against a
localhost coordinator (one CPU device each) and checks global-batch assembly
order and a cross-process reduction — the actual pod recipe.  The
single-process degenerate path (``global_batch`` -> ``device_put``) is
exercised by the rest of the suite.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from debiasing_multi_modal_tpu.parallel.mesh import batch_sharding, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    single_process: bool = False,
):
    """Initialize the JAX distributed runtime.

    On Cloud TPU pods call with no arguments — jax.distributed auto-detects
    the coordinator and process topology from the environment (the canonical
    pod recipe).  Pass ``single_process=True`` to skip initialization
    explicitly (local development); don't call this at all for plain
    single-host runs.
    """
    if single_process:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_names=("data",), shape=None) -> Mesh:
    """Mesh over *all* devices across hosts (jax.devices() is global)."""
    return make_mesh(shape=shape, axis_names=axis_names)


def global_batch(local_batch: np.ndarray, mesh: Mesh, axis: str = "data"):
    """Assemble a globally batch-sharded array from each process's local
    shard (every process passes its own rows; the global batch is their
    concatenation in process order).

    Every process MUST pass the same local batch shape — pad ragged final
    batches to a uniform size upstream (data/samplers.BatchPlan and
    ExtractionRunner already do).  Raggedness cannot be detected locally;
    mismatched shapes fail inside JAX with a shape error.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)
