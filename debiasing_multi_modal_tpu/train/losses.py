"""Losses: masked cross-entropy and the supervised-contrastive objective.

Parity surfaces: torch ``CrossEntropyLoss`` (mean reduction) used throughout
``final_main.py``; ``SupervisedContrastiveLoss`` (demo/visualizer_supcon.py:
1522-1587) — cosine similarities / temperature against a single anchor, max-
subtracted exponentials, ``-log(exp_pos / (sum exp_pos + sum exp_neg))``
averaged over positives.  The reference computes this per-anchor with Python
loops and per-anchor ``backward``; here one jitted call evaluates a whole
[num_rows, 1 + P + N] contrastive batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_cross_entropy(
    logits: jax.Array, labels: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Mean CE over valid rows (padded rows excluded from the mean)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is None:
        return nll.mean()
    m = mask.astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def supcon_loss(
    anchor_feats: jax.Array,  # [R, D]   adapted features of the anchors
    pos_feats: jax.Array,  # [R, P, D] positives per anchor row
    neg_feats: jax.Array,  # [R, N, D] negatives per anchor row
    temperature: float = 0.1,
) -> jax.Array:
    """Vectorized supervised-contrastive loss over R anchor rows."""

    def _norm(x):
        x = x.astype(jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    a = _norm(anchor_feats)[:, None, :]  # [R, 1, D]
    pos = jnp.sum(a * _norm(pos_feats), axis=-1) / temperature  # [R, P]
    neg = jnp.sum(a * _norm(neg_feats), axis=-1) / temperature  # [R, N]

    max_pos = jax.lax.stop_gradient(jnp.max(pos, axis=-1, keepdims=True))
    exp_pos = jnp.exp(pos - max_pos)
    exp_neg = jnp.exp(neg - max_pos)
    denom = exp_pos.sum(-1, keepdims=True) + exp_neg.sum(-1, keepdims=True)
    # (pos - max_pos) directly, NOT log(exp_pos): the exp/log round trip
    # underflows to -inf (NaN gradients) once pos - max_pos < ~-88, which
    # small cl_temperature values reach; this form is exact and cheaper
    log_probs = (pos - max_pos) - jnp.log(denom)
    return (-log_probs).mean()
