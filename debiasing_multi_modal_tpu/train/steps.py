"""Jitted training/evaluation over whole epochs.

The reference's per-batch Python loop (final_main.py:426-653) becomes one
``lax.scan`` inside a single jitted function per epoch: batches are gathered
on device from the resident embedding table by the epoch's index plan
(data/samplers.BatchPlan), the per-batch learning-rate vector comes from the
pure schedule functions, and group-accuracy meters ride the scan carry as
segment sums.  SGD reproduces torch semantics exactly: ``d = g + wd * p``,
``buf = momentum * buf + d``, ``p -= lr * buf`` (demo/util.py:118-136),
with a 0/1 mask tree standing in for ``set_optimizer_reg``'s parameter
filtering (frozen old adapter).

Static shapes: the last partial batch is padded under a False mask
(drop_last=False parity); CE, BatchNorm statistics, and metrics all honor the
mask, so numerics match the reference's variable-size final batch.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.train.losses import masked_cross_entropy
from debiasing_multi_modal_tpu.train.metrics import batch_group_counts


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    trace: Any  # SGD momentum buffers


def init_train_state(params, batch_stats) -> TrainState:
    trace = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params, batch_stats, trace)


def reset_optimizer(state: TrainState) -> TrainState:
    """Fresh momentum at the phase boundary (final_main.py:947-950)."""
    return TrainState(state.params, state.batch_stats, jax.tree.map(jnp.zeros_like, state.params))


def ones_mask(params):
    return jax.tree.map(lambda p: jnp.float32(1.0), params)


def freeze_subtrees(params, frozen_names: Tuple[str, ...]):
    """0/1 mask tree: 0 for params under any top-level name in frozen_names."""
    return {
        k: jax.tree.map(
            lambda p, z=(k in frozen_names): jnp.float32(0.0 if z else 1.0), v
        )
        for k, v in params.items()
    }


def _sgd(params, grads, trace, lr, momentum, weight_decay, mask):
    # mask gates the WHOLE update, not just the grad+wd term: torch's
    # set_optimizer_reg EXCLUDES frozen params from the optimizer entirely
    # (demo/util.py:125-136), so a frozen param must not move even if its
    # momentum buffer holds a stale nonzero trace.  The trace keeps the
    # param's dtype so non-fp32 param policies don't change the scan carry
    # dtype between input and output.
    new_trace = jax.tree.map(
        lambda p, g, t, m: (
            (
                momentum * t.astype(jnp.float32)
                + g.astype(jnp.float32)
                + weight_decay * p.astype(jnp.float32)
            )
            * m
        ).astype(t.dtype),
        params,
        grads,
        trace,
        mask,
    )
    new_params = jax.tree.map(
        lambda p, t: (p - lr * t).astype(p.dtype), params, new_trace
    )
    return new_params, new_trace


class EpochStats(NamedTuple):
    corrects: jax.Array  # [n_groups]
    counts: jax.Array  # [n_groups]
    loss_sum: jax.Array  # sum(loss * n_valid)
    n: jax.Array  # total valid examples

    def merge(self, other: "EpochStats") -> "EpochStats":
        """Field-wise accumulation (the reference's meters accumulate both
        the train and the class-prompt reg pass, final_main.py:536,551);
        shared by the sequential loop and the vmapped sweep."""
        return EpochStats(
            self.corrects + other.corrects,
            self.counts + other.counts,
            self.loss_sum + other.loss_sum,
            self.n + other.n,
        )


def _train_epoch_impl(
    module,
    state: TrainState,
    embeddings: jax.Array,  # [N, D] resident on device
    labels: jax.Array,  # [N] int32 — already the chosen target (class/group/...)
    groups: jax.Array,  # [N] int32 — for metrics
    idx: jax.Array,  # [nb, B] int32 batch plan
    mask: jax.Array,  # [nb, B] bool
    lrs: jax.Array,  # [nb] float32
    text: jax.Array,  # [D, C] un-normalized text matrix
    train_mask: Any,  # 0/1 pytree over params
    *,
    active: Optional[jax.Array] = None,  # [nb] bool — False on padded steps
    n_groups: int = 4,
    momentum: float = 0.9,
    weight_decay: float = 5e-5,
) -> Tuple[TrainState, EpochStats]:
    """``active`` marks real scan steps when epochs of different lengths are
    stacked into one program (the bsr-axis grid, sweep/vmap_loop.py): a False
    step's batch is fully padded, and the whole carry update (params,
    momentum, BatchNorm stats, meters) is discarded via select so the step
    is a true no-op.  The select is NOT about NaNs (masked_cross_entropy and
    MaskedBatchNorm clamp their denominators, losses.py / adapter.py) — a
    padded step run as "zero-lr" would still apply weight decay to the
    trace, decay the momentum buffers, and drag BN running stats toward the
    all-padded batch's (0, 0) statistics."""
    gated = active is not None

    def body(carry, xs):
        st, acc = carry
        if gated:
            b_idx, b_mask, lr, act = xs
        else:
            b_idx, b_mask, lr = xs
        emb = embeddings[b_idx]
        lab = labels[b_idx]
        grp = groups[b_idx]

        def loss_fn(p):
            logits, mutated = module.apply(
                {"params": p, "batch_stats": st.batch_stats},
                emb,
                text,
                mask=b_mask,
                train=True,
                mutable=["batch_stats"],
            )
            return masked_cross_entropy(logits, lab, b_mask), (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params
        )
        new_params, new_trace = _sgd(
            st.params, grads, st.trace, lr, momentum, weight_decay, train_mask
        )
        new_st = TrainState(new_params, mutated["batch_stats"], new_trace)

        c, n = batch_group_counts(logits, lab, grp, b_mask, n_groups)
        nvalid = b_mask.astype(jnp.float32).sum()
        if gated:
            new_st = jax.tree.map(
                lambda new, old: jnp.where(act, new, old), new_st, st
            )
            zero = jnp.float32(0.0)
            c = jnp.where(act, c, zero)
            n = jnp.where(act, n, zero)
            loss_add = jnp.where(act, loss * nvalid, zero)
            nvalid = jnp.where(act, nvalid, zero)
        else:
            loss_add = loss * nvalid
        acc = EpochStats(
            acc.corrects + c,
            acc.counts + n,
            acc.loss_sum + loss_add,
            acc.n + nvalid,
        )
        return (new_st, acc), None

    zeros = EpochStats(
        jnp.zeros(n_groups, jnp.float32),
        jnp.zeros(n_groups, jnp.float32),
        jnp.float32(0.0),
        jnp.float32(0.0),
    )
    xs = (idx, mask, lrs, active) if gated else (idx, mask, lrs)
    (state, stats), _ = jax.lax.scan(body, (state, zeros), xs)
    return state, stats


train_epoch = functools.partial(
    jax.jit, static_argnames=("module", "n_groups", "momentum", "weight_decay")
)(_train_epoch_impl)


@functools.partial(
    jax.jit,
    static_argnames=("module", "n_groups", "momentum", "weight_decay"),
)
def train_epoch_vmapped(
    module,
    state: TrainState,  # leading seed axis on every leaf
    embeddings: jax.Array,  # shared across seeds
    labels: jax.Array,
    groups: jax.Array,
    idx: jax.Array,  # [S, nb, B] per-seed shuffles
    mask: jax.Array,  # [S, nb, B]
    lrs: jax.Array,  # [nb] shared schedule, or [S, nb] per-row schedules
    text: jax.Array,
    train_mask: Any,  # scalar-leaf 0/1 pytree, shared
    *,
    active: Optional[jax.Array] = None,  # [S, nb] bool — per-row real steps
    n_groups: int = 4,
    momentum: float = 0.9,
    weight_decay: float = 5e-5,
) -> Tuple[TrainState, EpochStats]:
    """S seeds train simultaneously: one compiled program per (shape, module).

    Module-level jit so every epoch of every sweep reuses the same cache
    entry — a per-epoch ``jax.vmap`` closure would re-trace each call.

    2-D ``lrs`` gives each stacked row its own schedule — the lr-axis grid
    stacking of ``run_sweep(stack_lr_axis=True)``, where rows are
    (lr cell x seed) pairs rather than seeds alone.  ``active`` marks each
    row's real scan steps when rows stack different batch sizes (the
    bsr-axis grid): rows with fewer batches pad to the longest epoch and
    no-op through their padded tail.
    """

    def one(st, idx_i, msk_i, lrs_i, act_i):
        return _train_epoch_impl(
            module, st, embeddings, labels, groups, idx_i, msk_i, lrs_i, text,
            train_mask, active=act_i, n_groups=n_groups, momentum=momentum,
            weight_decay=weight_decay,
        )

    if active is not None:
        if lrs.ndim != 2:
            lrs = jnp.broadcast_to(lrs, (idx.shape[0],) + lrs.shape)
        return jax.vmap(one)(state, idx, mask, lrs, active)
    if lrs.ndim == 2:
        return jax.vmap(lambda st, i, m, l: one(st, i, m, l, None))(
            state, idx, mask, lrs
        )
    return jax.vmap(lambda st, i, m: one(st, i, m, lrs, None))(state, idx, mask)


def _eval_epoch_impl(
    module,
    params,
    batch_stats,
    embeddings: jax.Array,
    labels: jax.Array,
    groups: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    text: jax.Array,
    *,
    n_groups: int = 4,
) -> EpochStats:
    """Evaluation with running BatchNorm statistics (classifier.eval())."""

    def body(acc, xs):
        b_idx, b_mask = xs
        emb = embeddings[b_idx]
        lab = labels[b_idx]
        grp = groups[b_idx]
        logits = module.apply(
            {"params": params, "batch_stats": batch_stats},
            emb,
            text,
            mask=b_mask,
            train=False,
        )
        loss = masked_cross_entropy(logits, lab, b_mask)
        c, n = batch_group_counts(logits, lab, grp, b_mask, n_groups)
        nvalid = b_mask.astype(jnp.float32).sum()
        return (
            EpochStats(
                acc.corrects + c, acc.counts + n, acc.loss_sum + loss * nvalid, acc.n + nvalid
            ),
            None,
        )

    zeros = EpochStats(
        jnp.zeros(n_groups, jnp.float32),
        jnp.zeros(n_groups, jnp.float32),
        jnp.float32(0.0),
        jnp.float32(0.0),
    )
    stats, _ = jax.lax.scan(body, zeros, (idx, mask))
    return stats


eval_epoch = functools.partial(jax.jit, static_argnames=("module", "n_groups"))(
    _eval_epoch_impl
)


@functools.partial(jax.jit, static_argnames=("module", "n_groups"))
def eval_epoch_vmapped(
    module,
    params,  # leading seed axis
    batch_stats,  # leading seed axis
    embeddings: jax.Array,  # shared (deterministic eval plan: idx/mask too)
    labels: jax.Array,
    groups: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    text: jax.Array,
    *,
    n_groups: int = 4,
) -> EpochStats:
    def one(p, s):
        return _eval_epoch_impl(
            module, p, s, embeddings, labels, groups, idx, mask, text,
            n_groups=n_groups,
        )

    return jax.vmap(one)(params, batch_stats)
