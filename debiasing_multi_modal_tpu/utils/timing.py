"""Accumulator-chain timing for the remote-TPU tunnel.

``block_until_ready`` is not a reliable barrier over the axon tunnel and
single-call timings carry a multi-ms dispatch floor (docs/DESIGN.md §7), so
every perf script times K repetitions chained through a scalar accumulator
inside jitted programs and fetches ONE float at the end.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain_time(fn, *args, iters: int = 8) -> float:
    """Milliseconds per call of ``fn(*args)``, accumulator-chained.

    Each iteration runs one jitted program that applies ``fn`` and folds a
    scalar of its output into the carried accumulator; the single ``float``
    fetch at the end is the barrier.
    """

    @jax.jit
    def prog(acc, *a):
        out = fn(*a)
        return acc + jax.tree.leaves(out)[0].astype(jnp.float32).mean()

    float(prog(jnp.float32(0), *args))  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = prog(acc, *args)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3
