"""Persistent XLA compilation cache for the framework's entry points.

Program compiles dominate short runs in this environment (~10 s fixed
latency per program over the remote-TPU tunnel, docs/DESIGN.md §7).  JAX's
persistent compilation cache was verified to work through the axon backend:
a process re-running the same sweep/extraction loads every previously
compiled executable from disk in ~0 s.

Library code never enables this implicitly — the CLI drivers, bench
harnesses and demo scripts opt in at startup via
:func:`enable_persistent_cache`.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "debiasing_multi_modal_tpu", "xla"
)


def enable_persistent_cache(
    cache_dir: Optional[str] = None, min_compile_secs: float = 1.0
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` and return
    the directory used.

    Safe to call multiple times and before or after backend initialization
    (the cache is consulted per-compile).  ``min_compile_secs`` skips
    caching trivially cheap programs to keep the directory small.
    """
    import jax

    path = os.path.abspath(cache_dir or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return path
