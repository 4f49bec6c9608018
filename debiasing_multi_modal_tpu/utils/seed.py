"""Seeding (reference demo/util.py:61-68, torch-free).

Returns the two RNG streams the framework uses: a numpy Generator for host
sampling decisions (shuffles, balancing, resampling) and a JAX PRNGKey for
parameter initialization.  Also seeds the legacy global numpy RNG for any
third-party code (sklearn splits take explicit seeds, so this is belt-and-
braces)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def set_seed(seed: int) -> Tuple[np.random.Generator, "jax.Array"]:
    import jax

    np.random.seed(seed)
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
