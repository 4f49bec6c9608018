"""Ulysses-style sequence parallelism: all-to-all head<->sequence exchange.

The second SP flavor alongside the ring (``ops/ring_attention.py``), covering
the last parallelism strategy named absent from the reference (SURVEY.md
§2.9: "DP/TP/PP/SP/EP/CP/ring-attention/Ulysses: ABSENT").  Where the ring
keeps the sequence sharded and rotates kv chunks (n-1 ppermute hops,
online-softmax merge), Ulysses trades TWO ``all_to_all``s per attention call
for a plain full-sequence softmax:

- inputs arrive sequence-sharded ``[B, S/n, H, D]``;
- one ``all_to_all`` scatters the head axis and gathers the sequence axis
  -> ``[B, S, H/n, D]``: each device now holds the FULL sequence for a
  subset of heads, so ordinary (exact, causal-maskable) attention runs
  locally with no cross-device softmax bookkeeping;
- a reverse ``all_to_all`` restores ``[B, S/n, H, D]``.

Trade-off vs the ring (why both exist): Ulysses is two collectives of
activation-sized tensors on ICI and the SIMPLE attention kernel (XLA fuses
freely), but requires ``heads % n == 0`` and materializes full-S scores for
its local heads; the ring never materializes full S anywhere (the true
long-context memory story) at the cost of n-1 sequential hops.  Exactness:
``all_to_all`` is a permutation — the math is bitwise the attention the
oracle computes, no softmax merging at all.

Differentiable as-is: ``all_to_all``'s transpose is ``all_to_all``, so
``jax.grad`` works with no custom VJP (gradient parity pinned in tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from debiasing_multi_modal_tpu.ops.attention import _xla_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
) -> jax.Array:
    """Local-chunk Ulysses attention; call inside ``shard_map``.

    Args:
      q, k, v: LOCAL sequence chunks ``[B, S_local, H, D]`` (the global
        sequence is ``axis_size * S_local``, contiguously chunked in axis
        order).  ``H`` must be divisible by the axis size.
    Returns the local output chunk ``[B, S_local, H, D]``.
    """
    # scatter heads (axis 2), gather sequence (axis 1): [B, S, H/n, D]
    qg, kg, vg = (
        jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
        for x in (q, k, v)
    )
    o = _xla_attention(qg, kg, vg, causal=causal)
    # reverse: scatter sequence back, gather heads
    return jax.lax.all_to_all(
        o, axis_name, split_axis=1, concat_axis=2, tiled=True
    )


def ulysses_sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str,
    causal: bool = False,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """jit-level wrapper mirroring ``sequence_parallel_attention``: shard
    q/k/v's sequence axis over ``axis_name`` and run Ulysses attention.
    ``batch_axis`` also shards the batch dim (dp x sp meshes)."""
    if q.ndim != 4 or q.shape != k.shape or k.shape != v.shape:
        raise ValueError(
            f"ulysses attention is self-attention over [B,S,H,D]; "
            f"got q{q.shape} k{k.shape} v{v.shape}"
        )
    n = mesh.shape[axis_name]
    if q.shape[1] % n:
        raise ValueError(
            f"global sequence {q.shape[1]} must be divisible by the "
            f"'{axis_name}' axis size {n}"
        )
    if q.shape[2] % n:
        raise ValueError(
            f"heads {q.shape[2]} must be divisible by the '{axis_name}' "
            f"axis size {n}"
        )
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {q.shape[0]} must be divisible by the '{batch_axis}' axis size "
            f"{mesh.shape[batch_axis]}"
        )
    spec = PartitionSpec(batch_axis, axis_name, None, None)
    fn = jax.shard_map(
        lambda q, k, v: ulysses_attention(q, k, v, axis_name, causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
