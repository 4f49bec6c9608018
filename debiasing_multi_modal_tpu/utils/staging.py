"""Identity-keyed host->device staging cache.

The training loops pass the same numpy arrays (labels, groups, text
matrices, deterministic eval plans) into jitted epoch programs every epoch.
``jnp.asarray`` on a numpy array performs a fresh host->device transfer each
call — over the remote-TPU (axon) tunnel each buffer costs a round trip, and
the per-epoch re-uploads were measured to dominate the sweep wall-clock
(docs/DESIGN.md §4).  ``DeviceCache`` stages each distinct host array once
and returns the resident device array on every later call.

The cache holds a reference to the host array, so an ``id()`` can never be
recycled while its entry is alive.  With the default ``put``, device arrays
pass through untouched; a custom ``put`` (e.g. replication over a mesh via
``jax.device_put(a, NamedSharding(mesh, P()))``) is applied to device
arrays too, once per distinct input.

NO EVICTION: every staged host array (and its device buffer) stays pinned
for the cache's lifetime — that is the point (stable per-split arrays,
staged once).  Do NOT stage per-call fresh arrays (e.g. ``stage(a[order])``
inside an epoch loop): each call would pin a new entry forever.  Call
``clear()`` to drop everything when a workload's arrays are done.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceCache:
    """Callable: ``cache(host_array) -> device_array`` (staged at most once)."""

    def __init__(self, put: Optional[Callable[[Any], jax.Array]] = None) -> None:
        self._cache: Dict[int, Tuple[Any, jax.Array]] = {}
        self._put = put or jnp.asarray
        self._passthrough = put is None

    def __call__(self, arr) -> jax.Array:
        if self._passthrough and isinstance(arr, jax.Array):
            return arr
        got = self._cache.get(id(arr))
        if got is None or got[0] is not arr:
            got = (arr, self._put(arr))
            self._cache[id(arr)] = got
        return got[1]

    def __len__(self) -> int:
        return len(self._cache)

    def clear(self) -> None:
        """Release every pinned host reference and device buffer."""
        self._cache.clear()
