"""Test harness config: run everything on a virtual 8-device CPU mesh.

Distributed behavior (pjit sharding, collectives, vmapped sweeps) is validated
on faked host devices per SURVEY.md §7 — real multi-chip hardware is not
assumed at test time.
"""

import os

import re as _re

_flags = os.environ.get("XLA_FLAGS", "")
# normalize (not just append): a pre-existing count other than 8 would run
# the mesh-shaped tests on the wrong virtual-device count, failing far from
# the cause
_flags = _re.sub(r"--xla_force_host_platform_device_count=\S+", "", _flags)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# This environment presets jax_platforms to "axon,cpu" (the TPU tunnel), which
# overrides $JAX_PLATFORMS — force CPU programmatically instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
