"""Tensor parallelism for the CLIP encoder towers.

The reference is single-device (SURVEY.md §2.9); this module supplies the
pod-scale story the reference lacks: Megatron-style tensor-parallel sharding
of every transformer block in the ViT tower, the text tower, and the
ModifiedResNet's attention pool (the reference surfaces at clip/model.py
:58-91 attention pool, :171-240 ResidualAttentionBlock/VisionTransformer),
expressed the TPU-native way — *partition specs on the parameter tree*, with
XLA's SPMD partitioner propagating activation shardings and inserting the
collectives over ICI.

The sharding pattern per block (axis name ``model``):

- ``q/k/v_proj``: column-parallel — kernel ``[D, D]`` split on the *output*
  features (= attention heads), bias split likewise.  Each device computes
  its local heads end to end; the head-split reshape in
  ``ops/attention.dot_product_attention`` keeps the head axis sharded.
- ``attn.out_proj`` / ``attnpool.c_proj``: row-parallel — kernel split on the
  *input* features, bias replicated.  The contraction produces partial sums;
  XLA inserts one all-reduce per block (the Megatron f/g pattern).
- ``mlp.c_fc``: column-parallel on the 4D hidden dim; ``mlp.c_proj``:
  row-parallel back to D.
- Everything else (LayerNorms, embeddings, convolutions, BatchNorm stats,
  projections out of the residual stream) stays replicated: activations
  between blocks are replicated, so norms see full rows.

Requires ``tp`` (the ``model`` axis size) to divide every head count so the
sharded feature dim splits on whole heads — ``validate_tp`` checks this.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parents whose Dense kernels are column-parallel (output-feature split)
_COLUMN_PARENTS = ("q_proj", "k_proj", "v_proj", "c_fc")
# (parent, grandparent) pairs that are row-parallel (input-feature split)
_ROW_PARENTS = ("out_proj", "c_proj")


def _path_names(path) -> tuple:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        else:  # pragma: no cover - sequence index entries don't occur here
            names.append(str(entry))
    return tuple(names)


def _leaf_spec(names: tuple, axis: str) -> P:
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grand = names[-3] if len(names) >= 3 else ""
    if parent in _COLUMN_PARENTS:
        if leaf == "kernel":
            return P(None, axis)
        if leaf == "bias":
            return P(axis)
    if parent in _ROW_PARENTS:
        # attn.out_proj, mlp.c_proj, attnpool.c_proj — but NOT the ResNet
        # bottleneck convs (those parents are conv1/2/3) and NOT the ViT
        # output projection "proj" (a bare param, no Dense parent).
        if grand in ("attn", "mlp", "attnpool"):
            if leaf == "kernel":
                return P(axis, None)
            return P()
    return P()


def tp_specs(variables: Any, axis: str = "model") -> Any:
    """PartitionSpec tree for a CLIP (or tower) variable tree.

    Works on the full ``{'params': ..., 'batch_stats': ...}`` dict or any
    sub-tree; non-param collections come out fully replicated.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(_path_names(path), axis), variables
    )


def tp_shardings(variables: Any, mesh: Mesh, axis: str = "model") -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        tp_specs(variables, axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_variables(
    variables: Any, mesh: Mesh, axis: str = "model", shardings: Any = None
) -> Any:
    """Place a CLIP variable tree tensor-parallel on ``mesh``.

    ONE batched ``device_put`` over the whole tree: per-leaf puts pay a
    per-buffer round trip on remote links (the ~2x pathology
    parallel/packing.py documents).  Pass ``shardings`` when the caller
    already built the tree (ExtractionRunner does) to skip recomputing it.
    """
    if shardings is None:
        shardings = tp_shardings(variables, mesh, axis)
    return jax.device_put(variables, shardings)


def validate_tp(config, tp: int) -> None:
    """``tp`` must divide every head count (and thus every sharded feature
    dim) so column-parallel splits land on whole attention heads."""
    if tp <= 1:
        return
    heads = {"text": config.transformer_heads, "vision": config.vision_heads}
    for tower, h in heads.items():
        if h % tp:
            raise ValueError(
                f"tensor-parallel degree {tp} does not divide the {tower} "
                f"tower's {h} attention heads"
            )


def sharded_param_count(variables) -> int:
    """Number of leaves NOT fully replicated — used by tests/dryrun to prove
    the encoders are really tensor-parallel, not silently replicated."""
    n = 0
    for leaf in jax.tree.leaves(
        tp_specs(variables), is_leaf=lambda x: isinstance(x, P)
    ):
        if isinstance(leaf, P) and any(ax is not None for ax in leaf):
            n += 1
    return n
