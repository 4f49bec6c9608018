"""Linear evaluation of frozen representations (SupCon protocol).

Parity surface: reference ``workspace/jinsu/lin_eval.py`` — train a linear
classifier on features from a frozen encoder, SGD + the same step-decay/
warmup schedules, top-1 accuracy tracking.  The reference parallelizes the
encoder with ``torch.nn.DataParallel`` (:132-133); the TPU equivalent is the
mesh data-parallel batch sharding already used by the extraction runner.

Works on any feature source: cached CLIP embeddings, adapter outputs, or the
PlainResNet encoder (models/resnet_plain.py)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.train.losses import masked_cross_entropy
from debiasing_multi_modal_tpu.train.steps import _sgd, ones_mask


@functools.partial(
    jax.jit, static_argnames=("momentum", "weight_decay")
)
def _linear_epoch(params, trace, feats, labels, idx, mask, lrs, *,
                  momentum, weight_decay):
    mask_tree = ones_mask(params)

    def body(carry, xs):
        p, t, correct, total = carry
        b_idx, b_mask, lr = xs
        x = feats[b_idx]
        y = labels[b_idx]

        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return masked_cross_entropy(logits, y, b_mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p, t = _sgd(p, grads, t, lr, momentum, weight_decay, mask_tree)
        hit = ((jnp.argmax(logits, -1) == y) & b_mask).sum()
        return (p, t, correct + hit, total + b_mask.sum()), loss

    (params, trace, correct, total), losses = jax.lax.scan(
        body, (params, trace, jnp.int32(0), jnp.int32(0)), (idx, mask, lrs)
    )
    return params, trace, correct / jnp.maximum(total, 1), losses


def linear_probe(
    features: np.ndarray,
    labels: np.ndarray,
    num_classes: int = 2,
    epochs: int = 10,
    batch_size: int = 256,
    learning_rate: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    seed: int = 42,
    lr_decay_epochs: Tuple[int, ...] = (),
    lr_decay_rate: float = 0.1,
    cosine: bool = False,
    warm: bool = False,
) -> Tuple[dict, float]:
    """Train a linear head on frozen features; returns (params, train acc).

    The reference schedules (``adjust_learning_rate`` step/cosine decay +
    ``warmup_learning_rate``, workspace/jinsu/lin_eval.py via demo/util.py)
    apply when their knobs are set; the defaults train at constant lr."""
    from debiasing_multi_modal_tpu.data.samplers import epoch_plan
    from debiasing_multi_modal_tpu.train.config import TrainConfig
    from debiasing_multi_modal_tpu.train.schedules import epoch_batch_lrs

    sched_cfg = TrainConfig(
        tl_method="linear_probing", epochs=epochs,
        learning_rate=learning_rate,
        lr_decay_epochs=tuple(lr_decay_epochs) or (epochs + 1,),
        lr_decay_rate=lr_decay_rate, cosine=cosine,
        warm=warm,  # warm_epochs/warmup_from/to derive per the reference
        batch_size=batch_size, input_dim=int(features.shape[1]),
    )

    rng = np.random.default_rng(seed)
    d = features.shape[1]
    params = {
        "w": jnp.zeros((d, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    trace = jax.tree.map(jnp.zeros_like, params)
    feats = jnp.asarray(features, jnp.float32)
    labs = jnp.asarray(labels, jnp.int32)
    acc = 0.0
    for epoch in range(1, epochs + 1):
        plan = epoch_plan(len(features), batch_size, shuffle=True, rng=rng)
        lrs = jnp.asarray(
            epoch_batch_lrs(sched_cfg, epoch, plan.num_batches, phase=1)
        )
        params, trace, acc, _ = _linear_epoch(
            params, trace, feats, labs,
            jnp.asarray(plan.indices), jnp.asarray(plan.mask), lrs,
            momentum=momentum, weight_decay=weight_decay,
        )
    return jax.device_get(params), float(acc)


def evaluate_linear(params, features: np.ndarray, labels: np.ndarray) -> float:
    logits = features @ np.asarray(params["w"]) + np.asarray(params["b"])
    return float((logits.argmax(-1) == labels).mean())
