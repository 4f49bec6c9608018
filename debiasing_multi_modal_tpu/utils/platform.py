"""Platform selection for CLI entry points.

This environment's site preset (``jax_platforms=axon,cpu``) makes JAX ignore
the standard ``JAX_PLATFORMS`` env var (docs/DESIGN.md §7), so subprocess
drivers — the reproduction chain, the dress-rehearsal test — cannot pin the
backend the usual way.  ``DMT_PLATFORM`` is the framework-level override:
set it to ``cpu`` (or ``tpu``/``axon``) and every CLI main applies it via
``jax.config.update`` before touching the backend.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("DMT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
