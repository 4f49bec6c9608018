"""Mid-run checkpoint / resume (aux subsystem — SURVEY.md §5.4).

The reference only saves the best model at the END of training
(final_main.py:1112-1122) and loses everything on a crash (its own sweep logs
note a lost CSV).  The TPU-native framework checkpoints the full training
state — model params, BatchNorm running stats, SGD momentum, MultipleAdapter
state when present, best-model snapshot, epoch history, and the host RNG
state — via Orbax, and can resume bit-exactly mid-schedule (including across
the phase boundary).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from debiasing_multi_modal_tpu.utils.trees import host_copy as _to_host


def save_checkpoint(
    directory: str,
    epoch: int,
    payload: Dict[str, Any],
    rng: np.random.Generator,
    meta_extra: Optional[Dict[str, Any]] = None,
    keep: int = 2,
):
    """Write ``directory/ep{epoch:05d}`` and prune older checkpoints.

    ``payload`` holds array pytrees (saved via Orbax); ``meta_extra`` holds
    JSON-serializable host state (epoch history, best-model scalars)."""
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    step_dir = os.path.join(os.path.abspath(directory), f"ep{epoch:05d}")
    tree = {k: _to_host(v) for k, v in payload.items() if v is not None}
    ocp.PyTreeCheckpointer().save(step_dir, tree, force=True)
    meta = {
        "epoch": epoch,
        "keys": sorted(tree),
        "rng_state": rng.bit_generator.state,
        **(meta_extra or {}),
    }
    with open(os.path.join(step_dir, "host_meta.json"), "w") as f:
        json.dump(meta, f)

    import shutil

    all_dirs = sorted(
        d for d in os.listdir(directory)
        if d.startswith("ep") and os.path.isdir(os.path.join(directory, d))
    )
    # prune by COMPLETE checkpoints only: counting half-written dirs (crash
    # between the Orbax save and host_meta.json) toward `keep` would delete
    # complete checkpoints while the corrupt dirs survive — crash
    # protection silently dropping below `keep`.  Incomplete dirs older
    # than the one just written are junk; remove them too.
    complete = [
        d for d in all_dirs
        if os.path.isfile(os.path.join(directory, d, "host_meta.json"))
    ]
    doomed = set(complete[:-keep])
    doomed.update(
        d for d in all_dirs
        if d not in complete and d != f"ep{epoch:05d}"
    )
    for old in doomed:
        shutil.rmtree(os.path.join(directory, old))


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("ep") and os.path.isdir(os.path.join(directory, d))
    )
    # a crash between the Orbax save and the host_meta.json write leaves a
    # half-written step dir; fall back to the newest COMPLETE checkpoint
    for step in reversed(steps):
        if os.path.isfile(os.path.join(directory, step, "host_meta.json")):
            return os.path.join(directory, step)
    return None


def load_checkpoint(step_dir: str):
    """Returns (epoch, payload tree, full host meta dict)."""
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(step_dir))
    with open(os.path.join(step_dir, "host_meta.json")) as f:
        meta = json.load(f)
    return meta["epoch"], tree, meta


def restore_rng(rng_state) -> np.random.Generator:
    rng = np.random.default_rng(0)
    rng.bit_generator.state = rng_state
    return rng
