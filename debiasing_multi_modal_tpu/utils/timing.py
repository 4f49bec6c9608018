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
import numpy as np


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


def measure_upload_ms(images, iters: int = 3) -> float:
    """Tunnel H2D gauge: ship ``images`` (host numpy) to the device ``iters``
    times, forcing each transfer with a dependent scalar fetch.  Shared by
    bench.py and scripts/profile_e2e_stages.py so the gauge can never
    diverge between them."""
    probe = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))
    float(probe(jnp.asarray(images)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(probe(jnp.asarray(images)))
    return (time.perf_counter() - t0) / iters * 1e3


def measure_download_ms(make_outputs, iters: int = 3) -> float:
    """D2H gauge.  ``make_outputs()`` must return FRESH device arrays each
    call: jax.Array caches its fetched host copy (``_npy_value``), so timing
    repeated ``np.asarray`` of one array measures a cache hit, not D2H —
    an ~iters-fold underreport (round-3 review finding)."""
    # the pre-timing compute barrier is a dependent-SCALAR fetch, not
    # block_until_ready (this module's own header: not reliable over the
    # tunnel — a residual-compute wait would be billed to D2H)
    barrier = jax.jit(
        lambda *xs: sum(
            x.reshape(-1)[0].astype(jnp.float32) for x in xs
        )
    )

    outs = make_outputs()
    float(barrier(*outs))
    [np.asarray(o) for o in outs]  # warm any lazy layout work
    total = 0.0
    for _ in range(iters):
        outs = make_outputs()
        float(barrier(*outs))  # exclude compute; D2H starts cold
        t0 = time.perf_counter()
        [np.asarray(o) for o in outs]
        total += time.perf_counter() - t0
    return total / iters * 1e3
