"""Multi-seed training as ONE vmapped program.

Parity surface: the reference's multi-seed drivers re-run ``train_all_epochs``
per seed in a Python loop on one GPU (run_multiple/final_main_iteration_wb.py:
1129-1140).  The TPU-native replacement vmaps the whole epoch over a leading
seed axis: adapter parameters are tiny (~1 MB), so S seeds train
simultaneously in one XLA program per epoch — the BASELINE.json config-4
"vmapped parallel adapter trainings".

Seed semantics mirror train/loop.py exactly: each seed gets its own numpy
Generator (shuffles, balancing, resampling) and its own PRNGKey (param init),
consumed in the same order as the sequential loop — tested for equivalence
against it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.data.samplers import (
    cached_eval_plan,
    balanced_subset_indices,
    epoch_plan,
    resampled_ce_weights,
    stratified_split_indices,
    weighted_sample_indices,
)
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import (
    DataBundle,
    _init_variables,
    make_classifier,
    make_multiple_classifier,
)
from debiasing_multi_modal_tpu.train.metrics import ordered, results_from_counts
from debiasing_multi_modal_tpu.train.schedules import epoch_batch_lrs
from debiasing_multi_modal_tpu.utils.staging import DeviceCache
from debiasing_multi_modal_tpu.train.steps import (
    TrainState,
    eval_epoch_vmapped,
    freeze_subtrees,
    init_train_state,
    ones_mask,
    train_epoch_vmapped,
)


@jax.jit
def _select_rows(base, update, mask):
    """Per-seed masked snapshot: rows of ``update`` where ``mask``, else
    ``base``.  Both trees carry a leading seed axis; mask is [S] bool.

    This keeps best-model bookkeeping ON DEVICE: with tens of seeds some
    seed improves almost every epoch, and the previous host-side snapshot
    (device_get of the full stacked state) was measured to dominate the
    sweep's per-epoch wall over the remote-TPU tunnel (docs/DESIGN.md §4).
    """

    def sel(b, u):
        return jnp.where(mask.reshape((-1,) + (1,) * (u.ndim - 1)), u, b)

    return jax.tree.map(sel, base, update)


@jax.jit
def _take_rows(tree, rows):
    """Gather a subset of seed rows from a stacked tree (one program)."""
    return jax.tree.map(lambda a: a[rows], tree)


def _init_stacked(module, cfg, keys, n_cls, *, init_on_first: bool = False):
    """Per-seed ``split`` + flax ``init`` as ONE jitted vmapped program.

    Un-jitted flax init dispatches hundreds of tiny ops per seed — over the
    tunnel that costs seconds per seed (CLAUDE.md environment rules).  Key
    consumption order matches the sequential loop exactly, which uses BOTH
    split orders: phase-1 init consumes the second split half
    (``key, init_key = split(key)``, train/loop.py) while the
    MultipleAdapter init consumes the first (``key_new, key = split(key)``)
    — pass ``init_on_first=True`` for the latter.
    """

    return _init_stacked_jit(
        module, keys, cfg.input_dim, n_cls, init_on_first
    )


@functools.partial(
    jax.jit, static_argnames=("module", "input_dim", "n_cls", "init_on_first")
)
def _init_stacked_jit(module, keys, input_dim, n_cls, init_on_first):
    # module-level jit keyed on what init ACTUALLY uses (input_dim, not the
    # whole TrainConfig): per-cell sweep calls across a 16-cell grid share
    # ONE trace/compile instead of re-tracing per cfg (the jit-cache rule
    # train/steps.py:197-200 documents)
    def one(k):
        a, b = jax.random.split(k)
        init_key, k_next = (a, b) if init_on_first else (b, a)
        p, s = _init_variables(module, input_dim, init_key, n_cls)
        return k_next, p, s

    return jax.vmap(one)(keys)


@functools.partial(jax.jit, static_argnames=("encoder", "input_dim"))
def _init_head_stacked(encoder, keys, input_dim):
    # contrastive projection head init, one vmapped program; key consumption
    # mirrors the sequential loop's `key, head_key = split(key)` (head uses
    # the SECOND half, the carry keeps the first — same as init_on_first=False)
    def one(k):
        k_next, init_key = jax.random.split(k)
        variables = encoder.init(
            init_key, jnp.zeros((2, input_dim), jnp.float32), train=True
        )
        return k_next, variables["params"]["head"]

    return jax.vmap(one)(keys)


def _pad_stack_plans(plans):
    """Stack per-row BatchPlans of differing shapes into padded arrays.

    Returns ``(idx [S, nb_max, bs_max], mask [S, nb_max, bs_max],
    active [S, nb_max])``: shorter epochs pad with index-0 batches under a
    False mask AND a False step-activity flag — the padded steps are true
    no-ops in the scan (train/steps.py ``active`` gating), so rows with
    different batch sizes train their exact per-cell semantics inside one
    program."""
    S = len(plans)
    nb_max = max(p.indices.shape[0] for p in plans)
    bs_max = max(p.indices.shape[1] for p in plans)
    idx = np.zeros((S, nb_max, bs_max), np.int32)
    msk = np.zeros((S, nb_max, bs_max), bool)
    act = np.zeros((S, nb_max), bool)
    for i, p in enumerate(plans):
        nb, bs = p.indices.shape
        idx[i, :nb, :bs] = p.indices
        msk[i, :nb, :bs] = p.mask
        act[i, :nb] = True
    return idx, msk, act


def train_seeds_vmapped(
    cfg: TrainConfig,
    bundle: DataBundle,
    seeds: Sequence[int],
    verbose: bool = False,
    mesh=None,
    lr_grid: Optional[Sequence[Tuple[float, float]]] = None,
    cell_grid: Optional[Sequence[TrainConfig]] = None,
):
    """Train all seeds simultaneously; returns a list (per seed) of the same
    ``((best_train, best_val, best_test), (zs_class, zs_spurious))`` tuples
    the sequential loop produces.

    With ``mesh`` (a ``jax.sharding.Mesh`` whose first axis is ``data``),
    the leading SEED axis is sharded across devices: seeds are independent,
    so an N-seed sweep scales embarrassingly over N chips — the multi-chip
    form the reference's one-GPU-per-seed Python loop cannot take.  XLA
    partitions every epoch program from the input shardings; no collectives
    are needed until the tiny per-epoch count fetch.  ``len(seeds)`` must be
    divisible by the mesh's ``data``-axis size.

    ``lr_grid`` stacks a learning-rate GRID axis into the same program: rows
    become (lr cell x seed) pairs — [(lr, lr_reg), ...] outer, seeds inner —
    each row training under its own schedule (per-row ``lrs`` in
    train_epoch_vmapped).  Grid cells that differ only in lr share every
    tensor shape, so the reference's outer lr loop
    (final_main_iteration_ca.py:1179-1256) collapses into one XLA program
    per epoch.  Results return in row order (lr-major).

    ``cell_grid`` generalizes lr_grid to full per-cell configs that may also
    differ in ``batch_size_reg`` and ``batch_size`` (the reference's bsr/bs
    grid axes, run_final_main_iteration_wb.sh:22-24): epoch plans pad to the
    longest row's (num_batches, batch_size) and shorter rows no-op through
    their padded tail (``active`` gating in train/steps.py), so the ENTIRE
    (lr x bsr x bs) grid trains in ONE program.  Cells must agree with
    ``cfg`` in everything except learning_rate, learning_rate_reg,
    batch_size_reg, and batch_size.  Results return in cell order (cells
    outer, seeds inner).
    """
    if cell_grid is not None and lr_grid is not None:
        raise ValueError("pass either lr_grid or cell_grid, not both")
    if lr_grid is not None:
        cell_grid = [
            cfg.replace(learning_rate=float(lr), learning_rate_reg=float(lrr))
            for (lr, lrr) in lr_grid
        ]
    if cell_grid is not None:
        for rc in cell_grid:
            if rc.replace(
                learning_rate=cfg.learning_rate,
                learning_rate_reg=cfg.learning_rate_reg,
                batch_size_reg=cfg.batch_size_reg,
                batch_size=cfg.batch_size,
            ) != cfg:
                raise ValueError(
                    "cell_grid cells may differ from the base config only in "
                    "learning_rate / learning_rate_reg / batch_size_reg / "
                    "batch_size"
                )
        row_cfgs = [rc for rc in cell_grid for _ in seeds]
        seeds = [s for _ in cell_grid for s in seeds]
    else:
        row_cfgs = None
    S = len(seeds)
    rngs = [np.random.default_rng(s) for s in seeds]

    def batch_lrs(epoch, nb, phase):
        """[nb] shared schedule, or [S, nb] per-row when grid-stacked."""
        if row_cfgs is None:
            return epoch_batch_lrs(cfg, epoch, nb, phase)
        return np.stack([epoch_batch_lrs(rc, epoch, nb, phase) for rc in row_cfgs])

    def batch_lrs_plans(epoch, plans, phase):
        """Per-plan schedules: [nb] shared, or [S, nb_max] zero-padded when
        rows have their own configs or epoch lengths (warmup is indexed by
        the row's REAL batch count, matching its sequential run)."""
        nbs = [p.num_batches for p in plans]
        if row_cfgs is None and len(set(nbs)) == 1:
            return epoch_batch_lrs(cfg, epoch, nbs[0], phase)
        out = np.zeros((S, max(nbs)), np.float32)
        memo = {}  # rows of one grid cell share (cfg, nb) — compute once,
        # not once per seed (host CPU is 1 core; this runs every epoch)
        for i in range(S):
            rc = row_cfgs[i] if row_cfgs is not None else cfg
            mk = (rc, nbs[i])
            row = memo.get(mk)
            if row is None:
                row = memo[mk] = epoch_batch_lrs(rc, epoch, nbs[i], phase)
            out[i, : nbs[i]] = row
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_data = mesh.shape["data"]
        if S % n_data:
            what = (
                f"rows (grid cells x seeds) = {S}"
                if row_cfgs is not None
                else f"len(seeds)={S}"
            )
            raise ValueError(
                f"{what} must be divisible by the mesh data axis size ({n_data})"
            )
        seed_sharding = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())

        def place(tree):  # shard the leading seed axis
            return jax.device_put(tree, seed_sharding)

        def stage_put(a):  # replicate staged constants over the mesh
            return jax.device_put(jnp.asarray(a), replicated)
    else:
        def place(tree):
            return tree

        stage_put = None

    # stacked [S]-leading key array; one program instead of S host dispatches.
    # The vectorized path requires uint32-range seeds; PRNGKey itself accepts
    # any 64-bit int, so larger seeds take the per-seed fallback.
    if all(0 <= int(s) < 2 ** 32 for s in seeds):
        keysS = jax.jit(jax.vmap(jax.random.PRNGKey))(np.asarray(seeds, np.uint32))
    else:
        keysS = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

    if cfg.is_reg_method:
        reg_idx, val_idx = stratified_split_indices(bundle.val.group, 0.5, seed=42)
        reg_split = bundle.val.take(reg_idx)
        val_split = bundle.val.take(val_idx)
    else:
        reg_split, val_split = None, bundle.val
    # eval batching is semantics-free (running BN stats, per-row logits,
    # exact group counts) — grid-stacked rows share the largest cell's
    eval_bs = (
        (max(rc.batch_size_reg for rc in row_cfgs)
         if row_cfgs is not None else cfg.batch_size_reg)
        if cfg.is_reg_method
        else (max(rc.batch_size for rc in row_cfgs)
              if row_cfgs is not None else cfg.batch_size)
    )
    # train batch size per row when bs-stacked (list triggers per-row plans)
    train_bs = (
        [rc.batch_size for rc in row_cfgs]
        if row_cfgs is not None
        else cfg.batch_size
    )

    sample_weights = None
    if cfg.resample_ce:
        sample_weights = resampled_ce_weights(
            bundle.train.y, bundle.train.y_pred, n_classes=cfg.n_cls,
            correct_class_bias=True, reweighting_by_class=False,
        )

    single = make_classifier(cfg)
    multiple = make_multiple_classifier(cfg) if cfg.add_adapter else None

    keysS, params, stats = _init_stacked(single, cfg, keysS, cfg.n_cls)
    params, stats = place((params, stats))
    state = init_train_state(params, stats)
    full_mask = ones_mask(params)  # scalar-leaf mask, shared across seeds

    ma_state: Optional[TrainState] = None
    ma_mask = None

    # contrastive projection head (mirrors loop.py; key order identical)
    head_stateS: Optional[TrainState] = None
    if cfg.tl_method == "contrastive_adapter" and cfg.ca_head is not None:
        from debiasing_multi_modal_tpu.models.adapter import CAEncoder

        ca_encoder = CAEncoder(
            hidden_dim=cfg.adapter_feat_dim, ca_head=cfg.ca_head,
            ca_feat_dim=cfg.ca_feat_dim,
        )
        keysS, head_paramsS = _init_head_stacked(
            ca_encoder, keysS, cfg.input_dim
        )
        head_paramsS = place(head_paramsS)
        head_stateS = TrainState(
            head_paramsS, {}, jax.tree.map(jnp.zeros_like, head_paramsS)
        )

    train_labels = bundle.train.labels(cfg.train_target)
    if int(train_labels.max()) >= bundle.text_class.shape[1]:
        raise ValueError(
            f"train_target={cfg.train_target!r} yields labels up to "
            f"{int(train_labels.max())} but the class text matrix has only "
            f"{bundle.text_class.shape[1]} columns (see train/loop.py)"
        )
    val_labels = val_split.labels(cfg.train_target)
    test_labels_cls = bundle.test.labels("class")
    reg_labels_target = reg_split.labels(cfg.train_target) if reg_split is not None else None
    reg_labels_group = reg_split.group.astype(np.int32) if reg_split is not None else None
    if (
        reg_labels_group is not None
        and int(reg_labels_group.max()) >= bundle.text_group.shape[1]
    ):
        # silent-clamp guard, mirroring train/loop.py: group labels gather
        # into text_group's columns under jit
        raise ValueError(
            f"group labels reach {int(reg_labels_group.max())} but the group "
            f"text matrix has only {bundle.text_group.shape[1]} columns"
        )

    text_class, text_group = bundle.text_class, bundle.text_group
    feat_epochs = (
        cfg.epochs if cfg.epochs_feature_learning is None
        else cfg.epochs_feature_learning
    )  # 0 is a real value: stage 2 from epoch 1 (reference final_main.py:933)

    # Per-seed best bookkeeping: scalar records on host, parameter snapshots
    # ON DEVICE (see _select_rows).  Two stacked snapshot pairs, one per tree
    # structure — a seed's best may predate the MultipleAdapter switch while
    # another's postdates it; best["multiple"][i] routes the final read.
    # Unselected rows hold stale values and are never read.
    best = {
        "acc": np.zeros(S),
        "epoch": np.zeros(S, np.int64),
        "multiple": np.zeros(S, bool),
    }
    dev_best = {False: None, True: None}  # kind -> (params, batch_stats)
    contrastive_rows = None  # per-seed row matrices (same shape across seeds)
    ca_counts = (cfg.num_anchor, cfg.num_positive, cfg.num_negative)
    history = {"train": [[] for _ in range(S)], "val": [[] for _ in range(S)],
               "test": [[] for _ in range(S)]}

    # Host arrays that recur every epoch (labels, groups, text matrices,
    # deterministic eval plans) are staged to the device ONCE — per-epoch
    # jnp.asarray re-uploads were measured to dominate the sweep wall-clock
    # over the remote-TPU tunnel (docs/DESIGN.md §4).
    stage = DeviceCache(put=stage_put)
    eval_plans: Dict[Tuple[int, int], tuple] = {}

    def vm_train(module, st, split, labels, text, plansS, lrs, mask_tree):
        if len({p.indices.shape for p in plansS}) == 1:
            idxS = place(jnp.asarray(np.stack([p.indices for p in plansS])))
            maskS = place(jnp.asarray(np.stack([p.mask for p in plansS])))
            activeS = None
        else:  # bsr-stacked rows: pad to the longest epoch, gate the tail
            idx, msk, act = _pad_stack_plans(plansS)
            idxS = place(jnp.asarray(idx))
            maskS = place(jnp.asarray(msk))
            activeS = place(jnp.asarray(act))

        return train_epoch_vmapped(
            module, st, stage(split.emb), stage(labels), stage(split.group),
            idxS, maskS, jnp.asarray(lrs), stage(text), mask_tree,
            active=activeS, n_groups=bundle.n_groups, momentum=cfg.momentum,
            weight_decay=cfg.weight_decay,
        )

    def vm_eval(module, paramsS, statsS, split, labels, text):
        idx, msk = cached_eval_plan(eval_plans, split, eval_bs, stage)

        return eval_epoch_vmapped(
            module, paramsS, statsS, stage(split.emb), stage(labels),
            stage(split.group), idx, msk, stage(text),
            n_groups=bundle.n_groups,
        )

    def make_plans(split_len, bs, orders=None, shuffle=True):
        """``bs`` is shared (int) or per-row (list) for bsr-stacked grids."""
        plans = []
        for i in range(S):
            order = None if orders is None else orders[i]
            bs_i = bs[i] if isinstance(bs, list) else bs
            plans.append(
                epoch_plan(split_len, bs_i, shuffle=shuffle and order is None,
                           rng=rngs[i], order=order)
            )
        return plans

    for epoch in range(1, cfg.epochs + 1):
        # per-seed balanced reg orders; per-row reg batch size when stacked
        if cfg.balance_val and cfg.is_reg_method:
            reg_orders = [
                balanced_subset_indices(reg_split.group, rngs[i], bundle.n_groups)
                for i in range(S)
            ]
            reg_bs = [
                min((row_cfgs[i] if row_cfgs is not None else cfg).batch_size_reg,
                    len(reg_orders[i]))
                for i in range(S)
            ]
        elif reg_split is not None:
            reg_orders = None
            reg_bs = [
                (row_cfgs[i] if row_cfgs is not None else cfg).batch_size_reg
                for i in range(S)
            ]

        if cfg.tl_method == "adapter_reg":
            plans = make_plans(len(bundle.train), train_bs)
            lrs = batch_lrs_plans(epoch, plans, 1)
            state, statsS = vm_train(
                single, state, bundle.train, train_labels, text_class, plans,
                lrs, full_mask,
            )
            group_prompt = not cfg.use_cls_prompt_in_reg
            rplans = make_plans(len(reg_split), reg_bs, orders=reg_orders)
            rlrs = batch_lrs_plans(epoch, rplans, 1)
            state, reg_statsS = vm_train(
                single, state, reg_split,
                reg_labels_group if group_prompt else reg_labels_target,
                text_group if group_prompt else text_class, rplans, rlrs,
                full_mask,
            )
            if not group_prompt:
                statsS = statsS.merge(reg_statsS)
            train_statsS, train_weighted = statsS, False
        elif cfg.is_two_phase and epoch > feat_epochs:
            if epoch == feat_epochs + 1:
                if cfg.continue_from_best and (best["epoch"] > 0).any():
                    # per-seed semantics (mirrors the sequential loop): seeds
                    # with a best snapshot load it; the rest keep their
                    # current phase-1 state.  All phase-1 snapshots share the
                    # single-adapter structure, so one masked select suffices
                    # — no host round trip.
                    has1 = jnp.asarray(best["epoch"] > 0)
                    bp, bsts = dev_best[False]
                    state = init_train_state(
                        _select_rows(state.params, bp, has1),
                        _select_rows(state.batch_stats, bsts, has1),
                    )
                if cfg.add_adapter:
                    keysS, ma_params, ma_stats = _init_stacked(
                        multiple, cfg, keysS, cfg.n_cls, init_on_first=True
                    )
                    ma_params = dict(place(ma_params))
                    ma_stats = dict(place(ma_stats))
                    # device arrays are immutable — aliasing the old branch
                    # is snapshot-safe without a host copy
                    old_p = state.params["adapter"]
                    old_s = state.batch_stats["adapter"]
                    ma_params["old"] = old_p
                    ma_stats["old"] = old_s
                    if cfg.init_near_identity:
                        ma_params["new"] = old_p
                        ma_stats["new"] = old_s
                    ma_state = init_train_state(ma_params, ma_stats)
                    ma_mask = freeze_subtrees(ma_params, ("old",))
                else:
                    state = init_train_state(state.params, state.batch_stats)

            use_group = cfg.use_group_prompt(epoch)
            labels2 = reg_labels_group if use_group else reg_labels_target
            text2 = text_group if use_group else text_class
            rplans = make_plans(len(reg_split), reg_bs, orders=reg_orders)
            rlrs = batch_lrs_plans(epoch, rplans, 2)
            if cfg.add_adapter:
                ma_state, statsS = vm_train(
                    multiple, ma_state, reg_split, labels2, text2, rplans,
                    rlrs, ma_mask,
                )
            else:
                state, statsS = vm_train(
                    single, state, reg_split, labels2, text2, rplans, rlrs,
                    full_mask,
                )
            train_statsS, train_weighted = statsS, False
        elif cfg.tl_method == "contrastive_adapter":
            # Vmapped SupCon epoch: row construction/reshuffle consume each
            # seed's rng in the same order as the sequential loop; row counts
            # are seed-independent (the anchor pools depend only on the data),
            # so the stacked [S, nb, batch_factor, row_len] tensor is regular.
            from debiasing_multi_modal_tpu.models.adapter import AdapterMLP
            from debiasing_multi_modal_tpu.train.contrastive import (
                train_contrastive_epoch_vmapped,
            )

            if contrastive_rows is None:
                from debiasing_multi_modal_tpu.data.contrastive import (
                    clamp_counts,
                    construct_contrastive_rows,
                    prepare_contrastive_points,
                )

                points = prepare_contrastive_points(
                    bundle.train.y, bundle.train.y_pred
                )
                # mirrors loop.py: reference adjust_num_pos_neg_ clamping
                ca_counts = clamp_counts(points, *ca_counts)
                contrastive_rows = [
                    construct_contrastive_rows(points, *ca_counts, rngs[i])
                    for i in range(S)
                ]
            rowsS = []
            for i in range(S):
                r = contrastive_rows[i][rngs[i].permutation(len(contrastive_rows[i]))]
                if len(r) < cfg.batch_factor:
                    # degenerate fixtures — tile cyclically (see loop.py)
                    r = np.resize(r, (cfg.batch_factor, r.shape[1]))
                nb = max(len(r) // cfg.batch_factor, 1)
                rowsS.append(r[: nb * cfg.batch_factor].reshape(nb, cfg.batch_factor, -1))
            rowsS = place(jnp.asarray(np.stack(rowsS)))
            lrsj = jnp.asarray(batch_lrs(epoch, rowsS.shape[1], 1))
            if head_stateS is not None:
                from debiasing_multi_modal_tpu.models.adapter import CAEncoder

                mlp = CAEncoder(
                    hidden_dim=cfg.adapter_feat_dim, ca_head=cfg.ca_head,
                    ca_feat_dim=cfg.ca_feat_dim,
                )
                subS = TrainState(
                    {"adapter": state.params["adapter"],
                     "head": head_stateS.params},
                    {"adapter": state.batch_stats["adapter"]},
                    {"adapter": state.trace["adapter"],
                     "head": head_stateS.trace},
                )
                sub_mask = {"adapter": full_mask["adapter"],
                            "head": ones_mask(head_stateS.params)}
            else:
                mlp = AdapterMLP(hidden_dim=cfg.adapter_feat_dim)
                subS = TrainState(
                    state.params["adapter"],
                    state.batch_stats["adapter"],
                    state.trace["adapter"],
                )
                sub_mask = full_mask["adapter"]

            subS, _ = train_contrastive_epoch_vmapped(
                mlp, subS, stage(bundle.train.emb), rowsS, lrsj, sub_mask,
                num_anchor=ca_counts[0], num_positive=ca_counts[1],
                num_negative=ca_counts[2],
                temperature=cfg.cl_temperature,
                contrastive_weight=cfg.contrastive_weight,
                ca_pre_norm=cfg.ca_pre_norm,
                momentum=cfg.momentum, weight_decay=cfg.weight_decay,
            )
            if head_stateS is not None:
                head_stateS = TrainState(
                    subS.params["head"], {}, subS.trace["head"]
                )
                subS = TrainState(
                    subS.params["adapter"],
                    subS.batch_stats["adapter"],
                    subS.trace["adapter"],
                )
            state = TrainState(
                {**state.params, "adapter": subS.params},
                {**state.batch_stats, "adapter": subS.batch_stats},
                {**state.trace, "adapter": subS.trace},
            )
            if cfg.ca_ce_update != 0:
                # interleaved CE pass, mirroring loop.py's notebook-flow
                # branch (full epoch, or a ca_ce_update-batch cap) — same
                # per-seed rng consumption order as the sequential loop
                ce_orders = None
                if cfg.ca_ce_update > 0:
                    ce_orders = [
                        rngs[i].permutation(len(bundle.train))[
                            : cfg.ca_ce_update
                            * (train_bs[i] if isinstance(train_bs, list)
                               else train_bs)
                        ]
                        for i in range(S)
                    ]
                plans = make_plans(
                    len(bundle.train), train_bs, orders=ce_orders
                )
                lrs = batch_lrs_plans(epoch, plans, 1)
                state, statsS = vm_train(
                    single, state, bundle.train, train_labels, text_class,
                    plans, lrs, full_mask,
                )
                train_statsS, train_weighted = statsS, False
            else:
                # pure SupCon: the sequential loop reports contrastive train
                # metrics via the weighted zero-shot eval pass
                # (_evaluate -> weighted=True)
                train_statsS = vm_eval(
                    single, state.params, state.batch_stats, bundle.train,
                    train_labels, text_class,
                )
                train_weighted = True
        else:
            orders = None
            if sample_weights is not None:
                orders = [
                    weighted_sample_indices(sample_weights, len(bundle.train), rngs[i])
                    for i in range(S)
                ]
            plans = make_plans(len(bundle.train), train_bs, orders=orders)
            lrs = batch_lrs_plans(epoch, plans, 1)
            state, statsS = vm_train(
                single, state, bundle.train, train_labels, text_class, plans,
                lrs, full_mask,
            )
            train_statsS, train_weighted = statsS, False

        in_ma = cfg.add_adapter and cfg.is_two_phase and epoch > feat_epochs
        module = multiple if in_ma else single
        cur = ma_state if in_ma else state
        val_statsS = vm_eval(
            module, cur.params, cur.batch_stats, val_split, val_labels,
            text_class,
        )
        test_statsS = vm_eval(
            module, cur.params, cur.batch_stats, bundle.test,
            test_labels_cls, text_class,
        )
        # ONE host fetch for the epoch's train/val/test counters (each
        # device_get is a tunnel round trip; 3 beats the old 6*S)
        counts = jax.device_get(
            [(t.corrects, t.counts)
             for t in (train_statsS, val_statsS, test_statsS)]
        )

        def _res(fc, weighted):
            corr, cnt = fc
            return [
                results_from_counts(
                    corr[i], cnt[i], n_places=bundle.n_places,
                    train_group_ratio=(
                        bundle.train_group_ratio if weighted else None
                    ),
                )
                for i in range(S)
            ]

        train_res = _res(counts[0], train_weighted)
        val_res = _res(counts[1], True)
        test_res = _res(counts[2], True)
        for i in range(S):
            history["train"][i].append(ordered(train_res[i]))
            history["val"][i].append(ordered(val_res[i]))
            history["test"][i].append(ordered(test_res[i]))
        if verbose:
            print(f"epoch {epoch}: val worst", [round(v["worst_acc"], 4) for v in val_res])

        worst = np.asarray([v["worst_acc"] for v in val_res])
        improved = worst > best["acc"]
        if improved.any():
            m = jnp.asarray(improved)
            base = dev_best[in_ma] or (cur.params, cur.batch_stats)
            dev_best[in_ma] = (
                _select_rows(base[0], cur.params, m),
                _select_rows(base[1], cur.batch_stats, m),
            )
            best["acc"] = np.where(improved, worst, best["acc"])
            best["epoch"] = np.where(improved, epoch, best["epoch"])
            best["multiple"] = np.where(improved, in_ma, best["multiple"])

    # -------- final ZS probes with per-seed best models
    # Seeds that never improved keep their final state as "best" (mirrors the
    # sequential loop's degenerate-run fallback).
    final_in_ma = cfg.add_adapter and cfg.is_two_phase and cfg.epochs > feat_epochs
    final_state = ma_state if final_in_ma else state
    never = best["epoch"] == 0
    if never.any():
        m = jnp.asarray(never)
        base = dev_best[final_in_ma] or (final_state.params, final_state.batch_stats)
        dev_best[final_in_ma] = (
            _select_rows(base[0], final_state.params, m),
            _select_rows(base[1], final_state.batch_stats, m),
        )
        best["multiple"] = np.where(never, final_in_ma, best["multiple"])
        best["epoch"] = np.where(never, cfg.epochs, best["epoch"])

    def zs(target):
        text = bundle.text_class if target == "class" else bundle.text_spurious
        labels = bundle.test.labels(target)
        if cfg.tl_method == "linear_probing":
            from debiasing_multi_modal_tpu.train.loop import zero_shot_results

            return [zero_shot_results(bundle, target, cfg.zs_temperature)] * S
        # vmap per module kind (single vs MultipleAdapter best snapshots)
        out: List[Optional[Dict[str, float]]] = [None] * S
        for kind in (False, True):
            rows = [i for i in range(S) if bool(best["multiple"][i]) == kind]
            if not rows:
                continue
            module = multiple if kind else single
            ridx = jnp.asarray(np.asarray(rows, np.int32))
            p = _take_rows(dev_best[kind][0], ridx)
            s = _take_rows(dev_best[kind][1], ridx)
            statsS = vm_eval(module, p, s, bundle.test, labels, text)
            corr, cnt = jax.device_get((statsS.corrects, statsS.counts))
            res = [
                results_from_counts(
                    corr[j], cnt[j],
                    n_places=bundle.n_places,
                    train_group_ratio=bundle.train_group_ratio,
                )
                for j in range(len(rows))
            ]
            for j, i in enumerate(rows):
                out[i] = res[j]
        return out

    zs_class = zs("class")
    zs_spurious = zs("spurious")
    results = []

    for i in range(S):
        # never-improved rows were already forced to cfg.epochs above
        be = int(best["epoch"][i])
        results.append(
            (
                (
                    history["train"][i][be - 1],
                    history["val"][i][be - 1],
                    history["test"][i][be - 1],
                ),
                (ordered(zs_class[i]), ordered(zs_spurious[i])),
            )
        )
    return results
