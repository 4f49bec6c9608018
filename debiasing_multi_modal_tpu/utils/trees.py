"""Small pytree utilities shared across the trainer, sweeps, and checkpoints."""

from __future__ import annotations

import jax
import numpy as np


def host_copy(tree):
    """Device pytree -> host numpy pytree (one transfer per leaf)."""
    return jax.tree.map(np.asarray, jax.device_get(tree))
