"""Identity-keyed host->device staging cache.

The training loops pass the same numpy arrays (labels, groups, text
matrices, deterministic eval plans) into jitted epoch programs every epoch.
``jnp.asarray`` on a numpy array performs a fresh host->device transfer each
call — over the remote-TPU (axon) tunnel each buffer costs a round trip, and
the per-epoch re-uploads were measured to dominate the sweep wall-clock
(docs/DESIGN.md §4).  ``DeviceCache`` stages each distinct host array once
and returns the resident device array on every later call.

The cache holds a reference to the host array, so an ``id()`` can never be
recycled while its entry is alive.  Device arrays pass through untouched.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceCache:
    """Callable: ``cache(host_array) -> device_array`` (staged at most once)."""

    def __init__(self) -> None:
        self._cache: Dict[int, Tuple[Any, jax.Array]] = {}

    def __call__(self, arr) -> jax.Array:
        if isinstance(arr, jax.Array):
            return arr
        got = self._cache.get(id(arr))
        if got is None or got[0] is not arr:
            got = (arr, jnp.asarray(arr))
            self._cache[id(arr)] = got
        return got[1]

    def __len__(self) -> int:
        return len(self._cache)
