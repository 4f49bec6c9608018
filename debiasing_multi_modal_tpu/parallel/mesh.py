"""Device-mesh and sharding helpers.

The reference is single-CUDA-device throughout (SURVEY.md §2.9: no
torch.distributed anywhere; sweeps are hand-parallelized across GPUs via
``CUDA_VISIBLE_DEVICES``).  The TPU-native replacement is a
``jax.sharding.Mesh`` over ICI with data-parallel batch sharding for
extraction and training, replicated (tiny) adapter parameters, and XLA
inserting the collectives:

- extraction: images sharded on the ``data`` axis; encoder params replicated;
  gathered embeddings come back fully-addressable per host.
- adapter training: batch sharded on ``data``; the gradient all-reduce (psum)
  is inserted by XLA from the sharding annotations on the jitted step.
- ``model`` axis (optional): tensor-parallel sharding of the encoder matmuls
  for pod-scale ViT configurations — exercised by the multichip dry run.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh; defaults to all devices on a 1-D ``data`` axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    devices = devices[: int(np.prod(shape))]
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
