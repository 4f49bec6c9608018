"""Contrastive-adapter training (supervised-contrastive fine-tuning of the
embedding adapter).

Parity surface: reference ``demo/visualizer_supcon.py`` ``train_one_epoch_cl``
(:412-508) + ``SupervisedContrastiveLoss`` (:1522-1587): per anchor row
``[anchor | positives | negatives]``, cosine similarities of adapted features
at temperature 0.1, ``-log(exp_pos / (sum exp_pos + sum exp_neg))`` averaged
over positives; gradients accumulated over ``batch_factor`` rows per step.

TPU-native: the reference's per-anchor Python loop with per-anchor
``backward`` becomes one jitted scan where each step consumes
``rows_per_step`` whole rows — the gradient of ``contrastive_weight x``
the mean row loss equals the reference's accumulated gradient
(loss = contrastive_weight * supcon / batch_factor per anchor,
visualizer_supcon.py:477-479; the reference's --contrastive_weight flag is
clobbered to 0.1 by parse_option at :255, so 0.1 is the effective reference
value and the default here).  The adapter's BatchNorm sees the step's
flattened row batch in train mode (the reference normalizes over each
anchor/pos and anchor/neg sub-batch; documented deviation — statistics differ
only in grouping, not in scale).

``ca_pre_norm`` mirrors the effective reference configuration: the CA loss
path L2-normalizes embeddings BEFORE the adapter (``opt.ca_pre_norm = True``
set unconditionally in parse_option, visualizer_supcon.py:258; the working
notebook's ``forward_ca`` does ``x / x.norm()`` first) while the CE/ZS
forward feeds the adapter raw features (CustomCLIP.forward, :118-132).

Two reference sources disagree on step granularity and scaling — both are
expressible here (PARITY deviation 6): the never-runnable trainer
(visualizer_supcon.py:477-479) accumulates ``batch_factor`` rows per step
with the loss scaled by ``contrastive_weight`` (= the defaults), while the
working notebook steps SGD once per anchor row on the UNSCALED loss
(SupCon.ipynb cell 0:410-412; = ``batch_factor=1, contrastive_weight=1.0``)
and projects through a linear head (``cfg.ca_head='linear'`` →
``models/adapter.py::CAEncoder``; the module passed in is then the encoder,
and its head params ride the caller's separate head state).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.train.losses import supcon_loss
from debiasing_multi_modal_tpu.train.steps import TrainState, _sgd


def _train_contrastive_epoch_impl(
    module,  # AdapterMLP
    state: TrainState,
    embeddings: jax.Array,  # [N, D]
    rows: jax.Array,  # [nb, rows_per_step, A + P + Nn] int32
    lrs: jax.Array,  # [nb]
    train_mask,
    *,
    num_anchor: int,
    num_positive: int,
    num_negative: int,
    temperature: float = 0.1,
    contrastive_weight: float = 0.1,
    ca_pre_norm: bool = True,
    momentum: float = 0.9,
    weight_decay: float = 5e-5,
) -> Tuple[TrainState, jax.Array]:
    """Scan over contrastive steps; returns (state, mean loss per step)."""
    a, p, n = num_anchor, num_positive, num_negative

    def body(st, xs):
        step_rows, lr = xs  # [R, A+P+Nn]
        r = step_rows.shape[0]
        flat = step_rows.reshape(-1)
        emb = embeddings[flat]  # [R*(A+P+Nn), D]
        if ca_pre_norm:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        def loss_fn(params):
            adapted, mutated = module.apply(
                {"params": params, "batch_stats": st.batch_stats},
                emb,
                train=True,
                mutable=["batch_stats"],
            )
            adapted = adapted.reshape(r, a + p + n, -1)
            anchor = adapted[:, 0]
            pos = adapted[:, a : a + p]
            neg = adapted[:, a + p :]
            # reference scaling: loss = contrastive_weight * supcon /
            # batch_factor before each backward (visualizer_supcon.py
            # :477-479); the mean over rows supplies the 1/batch_factor
            return (
                contrastive_weight * supcon_loss(anchor, pos, neg, temperature),
                mutated,
            )

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        new_params, new_trace = _sgd(
            st.params, grads, st.trace, lr, momentum, weight_decay, train_mask
        )
        return TrainState(new_params, mutated["batch_stats"], new_trace), loss

    state, losses = jax.lax.scan(body, state, (rows, lrs))
    return state, losses


_CL_STATICS = (
    "module", "num_anchor", "num_positive", "num_negative",
    "temperature", "contrastive_weight", "ca_pre_norm", "momentum", "weight_decay",
)

train_contrastive_epoch = functools.partial(
    jax.jit, static_argnames=_CL_STATICS
)(_train_contrastive_epoch_impl)


@functools.partial(jax.jit, static_argnames=_CL_STATICS)
def train_contrastive_epoch_vmapped(
    module,
    state: TrainState,  # leading seed axis
    embeddings: jax.Array,  # shared
    rows: jax.Array,  # [S, nb, rows_per_step, A+P+Nn] per-seed shuffles
    lrs: jax.Array,  # [nb] shared schedule, or [S, nb] per-row schedules
    train_mask,  # scalar-leaf 0/1 pytree, shared
    *,
    num_anchor: int,
    num_positive: int,
    num_negative: int,
    temperature: float = 0.1,
    contrastive_weight: float = 0.1,
    ca_pre_norm: bool = True,
    momentum: float = 0.9,
    weight_decay: float = 5e-5,
) -> Tuple[TrainState, jax.Array]:
    """S seeds' SupCon epochs in one compiled program (module-level jit —
    see steps.train_epoch_vmapped for why)."""

    def one(st, rows_i, lrs_i):
        return _train_contrastive_epoch_impl(
            module, st, embeddings, rows_i, lrs_i, train_mask,
            num_anchor=num_anchor, num_positive=num_positive,
            num_negative=num_negative, temperature=temperature,
            contrastive_weight=contrastive_weight, ca_pre_norm=ca_pre_norm,
            momentum=momentum, weight_decay=weight_decay,
        )

    if lrs.ndim == 2:
        return jax.vmap(one)(state, rows, lrs)
    return jax.vmap(lambda st, r: one(st, r, lrs))(state, rows)
