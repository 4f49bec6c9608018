"""Two-phase sequential/alternating adapter training orchestrator.

Parity surface: reference ``train_all_epochs`` (final_main.py:805-1128) and
its epoch functions —

- phase 1 "feature learning": ERM on the train split with class prompts
  (``train_one_epoch``, :426-496).  ``--resample_ce`` trains on a zero-shot-
  failure resampled order here; the reference BUILDS that loader (:868-884)
  but never passes it to any epoch function — its flag only renames the
  results file (PARITY deviation 11).
- ``adapter_reg``: every epoch interleaves the train loader (class prompts)
  and the reg loader (group or class prompts) in one optimizer
  (``train_reg_one_epoch``, :498-569).
- phase 2 "balanced learning" (sequential methods): from epoch
  ``epochs_feature_learning + 1``, train only on the group-stratified half of
  the validation split (``train_reg_seq_one_epoch``, :571-653) with a fresh
  SGD (momentum reset, :947-950), optionally from the best-so-far model
  (``--continue_from_best``) and optionally through a MultipleAdapter whose
  old branch is frozen (``--add_adapter``, :940-951).  ``adapter_reg_seq_
  alter`` alternates class/group prompts on absolute epoch parity (:954-968);
  ``--balance_val`` re-balances the reg subset every epoch (:920-921).
- per-epoch validation on the val half (model selection by worst-group
  accuracy, :1001-1008) and logging-only test evaluation (:1012-1017);
  final zero-shot feature-quality probes (``validate_zs``, :725-803);
  results JSON + checkpoint (:1050-1122).  NOTE: the reference stores *test*
  results in the per-epoch "Val" slot (:1055, a known reporting bug); this
  rebuild stores the actual validation results.

All hot loops are the jitted scans of train/steps.py; this module only does
epoch bookkeeping, sampling plans, and host-side metric dictionaries.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.data.groups import GroupTable
from debiasing_multi_modal_tpu.data.samplers import (
    cached_eval_plan,
    balanced_subset_indices,
    epoch_plan,
    resampled_ce_weights,
    stratified_split_indices,
    weighted_sample_indices,
)
from debiasing_multi_modal_tpu.models.adapter import (
    AdapterClassifier,
    LinearClassifier,
    MultipleAdapterClassifier,
    zero_shot_logits,
)
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.metrics import ordered, results_from_counts
from debiasing_multi_modal_tpu.utils.staging import DeviceCache
from debiasing_multi_modal_tpu.train.schedules import epoch_batch_lrs
from debiasing_multi_modal_tpu.train.steps import (
    EpochStats,
    TrainState,
    eval_epoch,
    freeze_subtrees,
    init_train_state,
    ones_mask,
    train_epoch,
)


@dataclasses.dataclass
class SplitArrays:
    """One split's device-resident columns."""

    emb: jax.Array  # [N, D] float32
    y: np.ndarray
    place: np.ndarray
    group: np.ndarray
    y_pred: np.ndarray

    def __len__(self):
        return len(self.y)

    def labels(self, target: str) -> np.ndarray:
        return {
            "class": self.y,
            "spurious": self.place,
            "group": self.group,
        }[target].astype(np.int32)

    def take(self, idx: np.ndarray) -> "SplitArrays":
        return SplitArrays(
            emb=self.emb[np.asarray(idx)],
            y=self.y[idx],
            place=self.place[idx],
            group=self.group[idx],
            y_pred=self.y_pred[idx],
        )


@dataclasses.dataclass
class DataBundle:
    """Everything Stage B needs, resident in device/host memory."""

    train: SplitArrays
    val: SplitArrays
    test: SplitArrays
    text_class: np.ndarray  # [D, n_cls] un-normalized
    text_spurious: np.ndarray  # [D, 2]
    text_group: np.ndarray  # [D, 4]
    train_group_ratio: np.ndarray  # [4]
    n_groups: int = 4
    n_places: int = 2


def bundle_from_embedding_table(table, meta_by_split: Dict[str, GroupTable],
                                text_class, text_spurious, text_group) -> DataBundle:
    """Align an EmbeddingTable against per-split metadata (with the
    consistency assert) and device-put the embedding blocks."""
    splits = {}
    for name, meta in meta_by_split.items():
        sub = table.align_to(meta)
        splits[name] = SplitArrays(
            emb=jnp.asarray(sub.embeddings, jnp.float32),
            y=sub.y.astype(np.int32),
            place=sub.place.astype(np.int32),
            group=sub.group.astype(np.int32),
            y_pred=sub.y_pred.astype(np.int32),
        )
    train_meta = meta_by_split["train"]
    return DataBundle(
        train=splits["train"],
        val=splits["val"],
        test=splits["test"],
        text_class=np.asarray(text_class, np.float32),
        text_spurious=np.asarray(text_spurious, np.float32),
        text_group=np.asarray(text_group, np.float32),
        train_group_ratio=train_meta.group_ratio,
        n_groups=train_meta.n_groups,
        n_places=train_meta.n_places,
    )


def shard_bundle(bundle: "DataBundle", mesh) -> "DataBundle":
    """Re-place a bundle's embedding tables batch-sharded over the mesh's
    ``data`` axis.  The jitted epoch scans then run data-parallel — XLA
    inserts the gradient psum from the sharding annotations; nothing else in
    the training loop changes (SURVEY.md §5.8 plan).

    Split sizes need not divide the mesh: gathers inside jit handle uneven
    shards.  Pass the result anywhere a bundle is accepted (train_all_epochs,
    train_seeds_vmapped)."""
    from debiasing_multi_modal_tpu.parallel.mesh import batch_sharding, pad_to_multiple

    sharding = batch_sharding(mesh)
    n_dev = int(np.prod(mesh.devices.shape))

    def place(split: SplitArrays) -> SplitArrays:
        emb = split.emb
        n = emb.shape[0]
        padded = pad_to_multiple(n, n_dev)
        if padded != n:
            # pad rows are never gathered: batch plans index by the label
            # arrays' length, which stays n
            emb = jnp.concatenate(
                [emb, jnp.zeros((padded - n, emb.shape[1]), emb.dtype)]
            )
        return dataclasses.replace(split, emb=jax.device_put(emb, sharding))

    return dataclasses.replace(
        bundle,
        train=place(bundle.train),
        val=place(bundle.val),
        test=place(bundle.test),
    )


def bundle_from_files(
    dataset: str,
    data_dir: str,
    image_embedding_path: str,
    text_embedding_path: str,
    text_spurious_embedding_path: str,
    text_group_embedding_path: str,
) -> DataBundle:
    """Build the training bundle from on-disk caches (the reference's file-
    mediated Stage A -> Stage B boundary: final_main.py:816-854 loaders +
    get_text_embedding :414-424)."""
    from debiasing_multi_modal_tpu.data.embeddings_store import (
        load_embeddings,
        load_text_embeddings,
    )
    from debiasing_multi_modal_tpu.data.groups import load_metadata

    table = load_embeddings(image_embedding_path, dataset=dataset)
    meta_by_split = {
        split: load_metadata(dataset, data_dir, split)
        for split in ("train", "val", "test")
    }
    # load_text_embeddings returns [D, C] — the bundle's text-matrix layout
    text_class = load_text_embeddings(text_embedding_path)
    text_spurious = load_text_embeddings(text_spurious_embedding_path)
    text_group = load_text_embeddings(text_group_embedding_path)
    return bundle_from_embedding_table(
        table, meta_by_split, text_class, text_spurious, text_group
    )


# ----------------------------------------------------------------- helpers --


def _stats_to_results(stats: EpochStats, bundle: DataBundle, weighted: bool):
    return results_from_counts(
        np.asarray(stats.corrects),
        np.asarray(stats.counts),
        n_places=bundle.n_places,
        train_group_ratio=bundle.train_group_ratio if weighted else None,
    )


def _evaluate(
    module,
    state_params,
    state_stats,
    split: SplitArrays,
    labels: np.ndarray,
    text: np.ndarray,
    batch_size: int,
    bundle: DataBundle,
    stage=jnp.asarray,
    plan_cache: Optional[dict] = None,
) -> Dict[str, float]:
    """``stage``/``plan_cache`` let a driver reuse device-resident constants
    across epochs (utils/staging.DeviceCache) — per-epoch re-uploads over the
    remote-TPU tunnel were measured to dominate wall-clock (DESIGN.md §4)."""
    cached = cached_eval_plan(plan_cache, split, batch_size, jnp.asarray)
    stats = eval_epoch(
        module,
        state_params,
        state_stats,
        split.emb,
        stage(labels),
        stage(split.group),
        cached[0],
        cached[1],
        stage(text),
        n_groups=bundle.n_groups,
    )
    return _stats_to_results(stats, bundle, weighted=True)


def zero_shot_results(bundle: DataBundle, target: str,
                      zs_temperature: float) -> Dict[str, float]:
    """Raw-embedding zero-shot group accuracies on the test split — the pure
    CLIP baseline the reference's linear_probing branch probes
    (final_main.py:757).  Slices to the logical row count (shard_bundle may
    have padded the embedding block).  Shared by the sequential loop and the
    vmapped sweep."""
    text = bundle.text_class if target == "class" else bundle.text_spurious
    labels = bundle.test.labels(target)
    logits = np.asarray(
        zero_shot_logits(
            bundle.test.emb[: len(labels)], jnp.asarray(text), zs_temperature
        )
    )
    correct = logits.argmax(1) == labels
    corr = np.bincount(
        bundle.test.group, weights=correct, minlength=bundle.n_groups
    )
    cnt = np.bincount(bundle.test.group, minlength=bundle.n_groups)
    return results_from_counts(
        corr, cnt, bundle.n_places, bundle.train_group_ratio
    )


def make_classifier(cfg: TrainConfig):
    if cfg.tl_method == "linear_probing":
        return LinearClassifier(num_classes=cfg.n_cls)
    return AdapterClassifier(
        hidden_dim=cfg.adapter_feat_dim, temperature=cfg.zs_temperature
    )


def make_multiple_classifier(cfg: TrainConfig):
    return MultipleAdapterClassifier(
        hidden_dim=cfg.adapter_feat_dim, temperature=cfg.zs_temperature
    )


def _init_variables(module, input_dim: int, rng_key, text_cols: int):
    # takes input_dim (not the whole TrainConfig): callers that jit around
    # this must key their trace cache on what init actually uses, so grid
    # cells differing only in lr/bs share one compiled init program
    dummy = jnp.zeros((2, input_dim), jnp.float32)
    text = jnp.zeros((input_dim, text_cols), jnp.float32)
    variables = module.init(rng_key, dummy, text, mask=jnp.ones(2, bool), train=True)
    return variables["params"], variables.get("batch_stats", {})


# -------------------------------------------------------------- main driver --


def train_all_epochs(
    cfg: TrainConfig,
    bundle: DataBundle,
    verbose: bool = True,
    results_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    checkpoint_every: int = 10,
    capture: Optional[dict] = None,
):
    """Run the full schedule; returns ``((best_train, best_val, best_test),
    (zs_class, zs_spurious), history)`` — the reference's return tuple
    (final_main.py:1128) plus the epoch history.

    ``capture`` (matched-batch-order oracle support): pass an empty dict to
    record everything that distinguishes this run from a reference run with
    the same flags — the initial classifier weights in the reference's torch
    state-dict layout (``init_sd``), the realized per-epoch sample orders for
    the train and reg loaders (``orders``), per-epoch balanced-val subset
    orders (``balval``), and the new adapter's random init at the stage
    switch (``ma_new_sd``).  tests/reference_oracle_runner.py's ``matched``
    mode injects these into the reference's own trainer (custom Samplers +
    ``load_state_dict``) so the only remaining cross-implementation deltas
    are float-arithmetic ones — turning the oracle's statistical bands into
    numerical agreement.  Adapter-family methods only (the reference's
    ``resample_ce`` never trains on its resampled loader — PARITY deviation
    11 — and ``linear_probing``/``contrastive_adapter`` have different or
    absent reference state-dict surfaces).
    """
    if capture is not None:
        if cfg.tl_method not in (
            "adapter", "adapter_reg", "adapter_reg_seq", "adapter_reg_seq_alter"
        ) or cfg.resample_ce:
            raise ValueError(
                "capture (matched-order oracle) supports the adapter-family "
                "methods without resample_ce"
            )
        if resume:
            raise ValueError("capture does not support resumed runs")
        capture["orders"] = {"train": [], "reg": []}
        capture["balval"] = []
        capture["ma_new_sd"] = None
    rng = np.random.default_rng(cfg.random_seed)
    key = jax.random.PRNGKey(cfg.random_seed)

    def log(*a):
        if verbose:
            print(*a)

    # ----- data: reg/val split for the regularized methods
    if cfg.is_reg_method:
        reg_idx, val_idx = stratified_split_indices(bundle.val.group, 0.5, seed=42)
        reg_split = bundle.val.take(reg_idx)
        val_split = bundle.val.take(val_idx)
    else:
        reg_split, val_split = None, bundle.val

    eval_bs = cfg.batch_size_reg if cfg.is_reg_method else cfg.batch_size

    # ----- resampled train order weights (phase 1)
    sample_weights = None
    if cfg.resample_ce:
        sample_weights = resampled_ce_weights(
            bundle.train.y, bundle.train.y_pred, n_classes=cfg.n_cls,
            correct_class_bias=True, reweighting_by_class=False,
        )
        log("Using [Resampled] Train loader for feature learning")

    # ----- model/optimizer
    single = make_classifier(cfg)
    key, init_key = jax.random.split(key)
    params, batch_stats = _init_variables(single, cfg.input_dim, init_key, cfg.n_cls)
    if capture is not None:
        from debiasing_multi_modal_tpu.weights.convert import (
            adapter_variables_to_torch,
        )

        capture["init_sd"] = {
            k: np.asarray(v)
            for k, v in adapter_variables_to_torch(
                {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(batch_stats)}
            ).items()
        }
    state = init_train_state(params, batch_stats)
    full_mask = ones_mask(params)

    multiple = make_multiple_classifier(cfg) if cfg.add_adapter else None
    ma_state: Optional[TrainState] = None
    ma_mask = None

    # contrastive projection head (notebook ca_head='linear', SupCon.ipynb
    # cell 3:13): its params/momentum persist across CL epochs in a separate
    # state; the CE/eval path never sees them
    head_state: Optional[TrainState] = None
    if cfg.tl_method == "contrastive_adapter" and cfg.ca_head is not None:
        from debiasing_multi_modal_tpu.models.adapter import CAEncoder

        ca_encoder = CAEncoder(
            hidden_dim=cfg.adapter_feat_dim, ca_head=cfg.ca_head,
            ca_feat_dim=cfg.ca_feat_dim,
        )
        key, head_key = jax.random.split(key)
        head_vars = ca_encoder.init(
            head_key, jnp.zeros((2, cfg.input_dim), jnp.float32), train=True
        )
        # only the head subtree is kept — the adapter trains in the main
        # classifier state and is copied into the CL encoder per epoch
        head_state = init_train_state(head_vars["params"]["head"], {})

    train_labels = bundle.train.labels(cfg.train_target)
    if int(train_labels.max()) >= bundle.text_class.shape[1]:
        raise ValueError(
            f"train_target={cfg.train_target!r} yields labels up to "
            f"{int(train_labels.max())} but the class text matrix has only "
            f"{bundle.text_class.shape[1]} columns — under jit the gather "
            "would silently clamp instead of erroring (the torch reference "
            "crashes in CrossEntropyLoss); use 'class' or 'spurious'"
        )
    val_labels = val_split.labels(cfg.train_target)
    test_labels_cls = bundle.test.labels("class")
    reg_labels_target = reg_split.labels(cfg.train_target) if reg_split is not None else None
    reg_labels_group = reg_split.group.astype(np.int32) if reg_split is not None else None
    if (
        reg_labels_group is not None
        and int(reg_labels_group.max()) >= bundle.text_group.shape[1]
    ):
        # same silent-clamp guard for the group-prompt reg passes: group
        # labels gather into text_group's columns under jit
        raise ValueError(
            f"group labels reach {int(reg_labels_group.max())} but the group "
            f"text matrix has only {bundle.text_group.shape[1]} columns"
        )

    text_class = bundle.text_class
    text_group = bundle.text_group

    best = {"acc": 0.0, "epoch": 0, "params": None, "stats": None, "multiple": False}
    history = {"train": [], "val": [], "test": []}

    # Contrastive rows are built BEFORE any checkpoint restore: in a fresh
    # run they are the first rng consumption (nothing precedes them for this
    # method), and a resumed run must reproduce the ORIGINAL rows — the
    # restored mid-run rng state already accounts for these draws, so
    # rebuilding from it would silently train on different rows (round-3
    # review finding).
    contrastive_rows = None
    ca_counts = (cfg.num_anchor, cfg.num_positive, cfg.num_negative)
    if cfg.tl_method == "contrastive_adapter":
        from debiasing_multi_modal_tpu.data.contrastive import (
            clamp_counts,
            construct_contrastive_rows,
            prepare_contrastive_points,
        )

        points = prepare_contrastive_points(bundle.train.y, bundle.train.y_pred)
        # reference adjust_num_pos_neg_: shrink counts to the pools instead
        # of sampling with replacement (SupCon.ipynb cell 10:58)
        ca_counts = clamp_counts(points, *ca_counts)
        if ca_counts != (cfg.num_anchor, cfg.num_positive, cfg.num_negative):
            log(f"contrastive counts clamped to pools: {ca_counts}")
        contrastive_rows = construct_contrastive_rows(points, *ca_counts, rng)
        log(f"contrastive rows: {contrastive_rows.shape}")

    feat_epochs = (
        cfg.epochs if cfg.epochs_feature_learning is None
        else cfg.epochs_feature_learning
    )  # 0 is a real value: stage 2 from epoch 1 (reference final_main.py:933)
    start_epoch = 1

    # ----- resume from the latest checkpoint (aux subsystem §5.4)
    if resume and checkpoint_dir:
        from debiasing_multi_modal_tpu.train import checkpoint as ckpt

        step_dir = ckpt.latest_checkpoint(checkpoint_dir)
        if step_dir:
            saved_epoch, tree, meta = ckpt.load_checkpoint(step_dir)
            log(f"Resuming from {step_dir} (epoch {saved_epoch})")
            state = TrainState(
                jax.tree.map(jnp.asarray, tree["state"]["params"]),
                jax.tree.map(jnp.asarray, tree["state"]["batch_stats"]),
                jax.tree.map(jnp.asarray, tree["state"]["trace"]),
            )
            if "ma_state" in tree:
                ma_state = TrainState(
                    jax.tree.map(jnp.asarray, tree["ma_state"]["params"]),
                    jax.tree.map(jnp.asarray, tree["ma_state"]["batch_stats"]),
                    jax.tree.map(jnp.asarray, tree["ma_state"]["trace"]),
                )
                ma_mask = freeze_subtrees(ma_state.params, ("old",))
            if "head_state" in tree:
                head_state = TrainState(
                    jax.tree.map(jnp.asarray, tree["head_state"]["params"]),
                    {},
                    jax.tree.map(jnp.asarray, tree["head_state"]["trace"]),
                )
            if "best_params" in tree:
                best["params"] = tree["best_params"]
                best["stats"] = tree["best_stats"]
            best["acc"] = meta["best_acc"]
            best["epoch"] = meta["best_epoch"]
            best["multiple"] = meta["best_multiple"]
            history = meta["history"]
            rng = ckpt.restore_rng(meta["rng_state"])
            start_epoch = saved_epoch + 1

    def current_module_and_state(epoch):
        if cfg.add_adapter and cfg.is_two_phase and epoch > feat_epochs:
            return multiple, ma_state
        return single, state

    # stage recurring host constants once (see _evaluate docstring)
    stage = DeviceCache()
    plan_cache: dict = {}

    def run_train(sub_state, module, split, labels, text, bs, lrs_phase, epoch,
                  order, mask_tree, role="train"):
        plan = epoch_plan(len(split), bs, shuffle=order is None, rng=rng, order=order)
        if capture is not None and not (role == "reg" and cfg.balance_val):
            # the realized sample order this epoch actually consumed (balval
            # reg orders are recorded once per epoch at their draw site)
            flat = plan.indices.reshape(-1)[plan.mask.reshape(-1)]
            capture["orders"][role].append(np.asarray(flat, np.int64))
        lrs = epoch_batch_lrs(cfg, epoch, plan.num_batches, lrs_phase)
        new_state, stats = train_epoch(
            module,
            sub_state,
            split.emb,
            stage(labels),
            stage(split.group),
            jnp.asarray(plan.indices),
            jnp.asarray(plan.mask),
            jnp.asarray(lrs),
            stage(text),
            mask_tree,
            n_groups=bundle.n_groups,
            momentum=cfg.momentum,
            weight_decay=cfg.weight_decay,
        )
        return new_state, stats

    for epoch in range(start_epoch, cfg.epochs + 1):
        log(f"--- Epoch {epoch} ---")

        # per-epoch balanced reg subset (expressed as an index order into the
        # full reg split — no data movement, vmap/sweep friendly)
        if cfg.balance_val and cfg.is_reg_method:
            reg_order = balanced_subset_indices(reg_split.group, rng, bundle.n_groups)
            reg_bs = min(cfg.batch_size_reg, len(reg_order))
            if capture is not None:
                # one draw per epoch, phase 1 included — mirrors the
                # reference's unconditional per-epoch balance_val call
                # (final_main.py:920-921), so the runner's shim pops in sync
                capture["balval"].append(np.asarray(reg_order, np.int64))
        elif reg_split is not None:
            reg_order = None  # shuffle the whole reg split
            reg_bs = cfg.batch_size_reg

        # ---------------- train one epoch
        if cfg.tl_method == "adapter_reg":
            # interleaved: train loader (class prompts) then reg loader
            state, stats = run_train(
                state, single, bundle.train, train_labels, text_class,
                cfg.batch_size, 1, epoch, None, full_mask,
            )
            group_prompt = not cfg.use_cls_prompt_in_reg
            state, reg_stats = run_train(
                state, single, reg_split,
                reg_labels_group if group_prompt else reg_labels_target,
                text_group if group_prompt else text_class,
                reg_bs, 1, epoch, reg_order, full_mask, role="reg",
            )
            if not group_prompt:
                stats = stats.merge(reg_stats)
            train_res = _stats_to_results(stats, bundle, weighted=False)
        elif cfg.is_two_phase and epoch > feat_epochs:
            # ---------------- stage switch
            if epoch == feat_epochs + 1:
                if cfg.continue_from_best and best["params"] is not None:
                    log("Load Best (Worst-acc) Model.")
                    state = init_train_state(
                        jax.tree.map(jnp.asarray, best["params"]),
                        jax.tree.map(jnp.asarray, best["stats"]),
                    )
                if cfg.add_adapter:
                    log("Stage 2) New adapter for balanced text prompts")
                    key_new, key = jax.random.split(key)
                    ma_params, ma_stats = _init_variables(
                        multiple, cfg.input_dim, key_new, cfg.n_cls
                    )
                    # device arrays are immutable: referencing the old
                    # branch IS a snapshot — no host round trip needed
                    old_p = state.params["adapter"]
                    old_s = state.batch_stats["adapter"]
                    ma_params = dict(ma_params)
                    ma_stats = dict(ma_stats)
                    if capture is not None and not cfg.init_near_identity:
                        # the new branch's random init — the one stage-switch
                        # tensor the reference draws from ITS rng (Adapter()
                        # at final_main.py:335); exported so the runner can
                        # inject it (init_near_identity copies old instead,
                        # which both implementations derive identically)
                        from debiasing_multi_modal_tpu.weights.convert import (
                            _adapter_mlp_to_torch,
                        )

                        out: dict = {}
                        _adapter_mlp_to_torch(
                            jax.device_get(ma_params["new"]),
                            jax.device_get(ma_stats["new"]),
                            "new_adapter.", out,
                        )
                        capture["ma_new_sd"] = out
                    ma_params["old"] = old_p
                    ma_stats["old"] = old_s
                    if cfg.init_near_identity:
                        log("Initialize [New adapter] from [Old adapter]")
                        ma_params["new"] = old_p
                        ma_stats["new"] = old_s
                    ma_state = init_train_state(ma_params, ma_stats)
                    ma_mask = freeze_subtrees(ma_params, ("old",))
                else:
                    # fresh optimizer on the same params (momentum reset)
                    from debiasing_multi_modal_tpu.train.steps import reset_optimizer

                    state = reset_optimizer(state)

            use_group = cfg.use_group_prompt(epoch)
            labels2 = reg_labels_group if use_group else reg_labels_target
            text2 = text_group if use_group else text_class
            if cfg.add_adapter:
                ma_state, stats = run_train(
                    ma_state, multiple, reg_split, labels2, text2,
                    reg_bs, 2, epoch, reg_order, ma_mask, role="reg",
                )
            else:
                state, stats = run_train(
                    state, single, reg_split, labels2, text2,
                    reg_bs, 2, epoch, reg_order, full_mask, role="reg",
                )
            train_res = _stats_to_results(stats, bundle, weighted=False)
        elif cfg.tl_method == "contrastive_adapter":
            # Supervised-contrastive feature learning on the adapter (the
            # reference's notebook-driven CA trainer, visualizer_supcon.py
            # train_one_epoch_cl; final_main.py lists the method but has no
            # working branch for it).  Rows are built once from the zero-shot
            # slices; each epoch reshuffles them.  The working reference flow
            # (workspace/jinsu/SupCon.ipynb cell 7) interleaves a CE epoch
            # after every SupCon epoch — see cfg.ca_ce_update.
            from debiasing_multi_modal_tpu.models.adapter import AdapterMLP
            from debiasing_multi_modal_tpu.train.contrastive import (
                train_contrastive_epoch,
            )
            from debiasing_multi_modal_tpu.train.steps import TrainState as TS

            rows = contrastive_rows[rng.permutation(len(contrastive_rows))]
            if len(rows) < cfg.batch_factor:
                # degenerate fixtures: fewer rows than one optimizer step
                # consumes — tile cyclically (the reference's DataLoader
                # would emit one short batch; fixed shapes require padding)
                rows = np.resize(rows, (cfg.batch_factor, rows.shape[1]))
            nb = max(len(rows) // cfg.batch_factor, 1)
            rows = rows[: nb * cfg.batch_factor].reshape(
                nb, cfg.batch_factor, -1
            )
            lrs = epoch_batch_lrs(cfg, epoch, nb, 1)
            if head_state is not None:
                # CL encoder = adapter + projection head (notebook
                # forward_ca); the head's params/momentum ride head_state
                from debiasing_multi_modal_tpu.models.adapter import CAEncoder

                mlp = CAEncoder(
                    hidden_dim=cfg.adapter_feat_dim, ca_head=cfg.ca_head,
                    ca_feat_dim=cfg.ca_feat_dim,
                )
                sub_state = TS(
                    {"adapter": state.params["adapter"],
                     "head": head_state.params},
                    {"adapter": state.batch_stats["adapter"]},
                    {"adapter": state.trace["adapter"],
                     "head": head_state.trace},
                )
            else:
                mlp = AdapterMLP(hidden_dim=cfg.adapter_feat_dim)
                sub_state = TS(
                    state.params["adapter"],
                    state.batch_stats["adapter"],
                    state.trace["adapter"],
                )
            sub_state, cl_losses = train_contrastive_epoch(
                mlp, sub_state, bundle.train.emb, jnp.asarray(rows),
                jnp.asarray(lrs), ones_mask(sub_state.params),
                num_anchor=ca_counts[0], num_positive=ca_counts[1],
                num_negative=ca_counts[2], temperature=cfg.cl_temperature,
                contrastive_weight=cfg.contrastive_weight,
                ca_pre_norm=cfg.ca_pre_norm,
                momentum=cfg.momentum, weight_decay=cfg.weight_decay,
            )
            if head_state is not None:
                head_state = TS(
                    sub_state.params["head"], {}, sub_state.trace["head"]
                )
                sub_state = TS(
                    sub_state.params["adapter"],
                    sub_state.batch_stats["adapter"],
                    sub_state.trace["adapter"],
                )
            state = TS(
                {**state.params, "adapter": sub_state.params},
                {**state.batch_stats, "adapter": sub_state.batch_stats},
                {**state.trace, "adapter": sub_state.trace},
            )
            history.setdefault("cl_loss", []).append(
                float(np.mean(np.asarray(cl_losses)))
            )
            log(f"contrastive loss: {history['cl_loss'][-1]:.4f}")
            if cfg.ca_ce_update != 0:
                # interleaved CE pass on the same params/optimizer (the
                # notebook flow's train_one_epoch call right after
                # train_one_epoch_cl; ca_ce_update > 0 caps the batch count
                # as visualizer_supcon.py:354 intends)
                ce_order = None
                if cfg.ca_ce_update > 0:
                    ce_order = rng.permutation(len(bundle.train))[
                        : cfg.ca_ce_update * cfg.batch_size
                    ]
                state, stats = run_train(
                    state, single, bundle.train, train_labels, text_class,
                    cfg.batch_size, 1, epoch, ce_order, full_mask,
                )
                train_res = _stats_to_results(stats, bundle, weighted=False)
            else:
                # pure SupCon: train metrics via the zero-shot head on the
                # train split (the CL epoch reports loss only; group
                # accuracy comes from validation passes).  NOTE the Train
                # slot consequently carries weighted_mean_acc for this mode
                # only (_evaluate reports weighted=True) — the vmapped sweep
                # matches (vmap_loop.py train_weighted=True)
                train_res = _evaluate(
                    single, state.params, state.batch_stats, bundle.train,
                    train_labels, text_class, cfg.batch_size, bundle,
                    stage=stage, plan_cache=plan_cache,
                )
        else:
            # plain ERM epoch (linear_probing / adapter / phase 1)
            order = None
            if sample_weights is not None:
                order = weighted_sample_indices(
                    sample_weights, len(bundle.train), rng
                )
            state, stats = run_train(
                state, single, bundle.train, train_labels, text_class,
                cfg.batch_size, 1, epoch, order, full_mask,
            )
            train_res = _stats_to_results(stats, bundle, weighted=False)

        # ---------------- evaluate
        module, cur = current_module_and_state(epoch)
        val_res = _evaluate(
            module, cur.params, cur.batch_stats, val_split, val_labels,
            text_class, eval_bs, bundle, stage=stage, plan_cache=plan_cache,
        )
        test_res = _evaluate(
            module, cur.params, cur.batch_stats, bundle.test, test_labels_cls,
            text_class, eval_bs, bundle, stage=stage, plan_cache=plan_cache,
        )
        history["train"].append(ordered(train_res))
        history["val"].append(ordered(val_res))
        history["test"].append(ordered(test_res))
        log("Train:", ordered(train_res))
        log("Val:", ordered(val_res))
        log("Test:", ordered(test_res))

        if val_res["worst_acc"] > best["acc"]:
            # immutable device trees: holding the reference snapshots the
            # epoch without a tunnel round trip (checkpointing still hosts
            # a copy on its own schedule)
            best.update(
                acc=val_res["worst_acc"],
                epoch=epoch,
                params=cur.params,
                stats=cur.batch_stats,
                multiple=module is multiple,
            )

        if checkpoint_dir and (
            # checkpoint_every <= 0 means final-epoch-only checkpoints
            (checkpoint_every > 0 and epoch % checkpoint_every == 0)
            or epoch == cfg.epochs
        ):
            from debiasing_multi_modal_tpu.train import checkpoint as ckpt

            payload = {
                "state": {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "trace": state.trace,
                },
            }
            if ma_state is not None:
                payload["ma_state"] = {
                    "params": ma_state.params,
                    "batch_stats": ma_state.batch_stats,
                    "trace": ma_state.trace,
                }
            if head_state is not None:
                payload["head_state"] = {
                    "params": head_state.params,
                    "trace": head_state.trace,
                }
            if best["params"] is not None:
                payload["best_params"] = best["params"]
                payload["best_stats"] = best["stats"]
            ckpt.save_checkpoint(
                checkpoint_dir,
                epoch,
                payload,
                rng,
                meta_extra={
                    "best_acc": float(best["acc"]),
                    "best_epoch": int(best["epoch"]),
                    "best_multiple": bool(best["multiple"]),
                    "history": history,
                },
            )

    if best["params"] is None:  # degenerate run — keep the final model
        module, cur = current_module_and_state(cfg.epochs)
        best.update(
            epoch=cfg.epochs,
            params=cur.params,
            stats=cur.batch_stats,
            multiple=module is multiple,
        )

    best_epoch = best["epoch"] if best["epoch"] > 0 else cfg.epochs
    best_train = history["train"][best_epoch - 1]
    best_val = history["val"][best_epoch - 1]
    best_test = history["test"][best_epoch - 1]
    log(f"best epoch : {best_epoch}")

    # ---------------- zero-shot feature-quality probes on the best model
    best_module = multiple if best["multiple"] else single
    best_params = jax.tree.map(jnp.asarray, best["params"])
    best_stats = jax.tree.map(jnp.asarray, best["stats"])

    def zs_eval(target: str) -> Dict[str, float]:
        text = bundle.text_class if target == "class" else bundle.text_spurious
        labels = bundle.test.labels(target)
        if cfg.tl_method == "linear_probing":
            return zero_shot_results(bundle, target, cfg.zs_temperature)
        return _evaluate(
            best_module, best_params, best_stats, bundle.test, labels, text,
            eval_bs, bundle, stage=stage, plan_cache=plan_cache,
        )

    zs_class = zs_eval("class")
    zs_spurious = zs_eval("spurious")
    log("zero-shot (test, class):", ordered(zs_class))
    log("zero-shot (test, spurious):", ordered(zs_spurious))

    if cfg.save_results and results_dir:
        os.makedirs(results_dir, exist_ok=True)
        name = encode_run_name(cfg)
        payload = {
            "Final Results (best epoch)": {
                f"Epoch {best_epoch}": {
                    "Train": best_train, "Val": best_val, "Test": best_test,
                }
            },
            "Feature Quality (using zs)": {
                "class": ordered(zs_class),
                "spurious": ordered(zs_spurious),
            },
            "All Results (all epoch)": {
                f"Epoch {e + 1}": {
                    "Train": history["train"][e],
                    "Val": history["val"][e],
                    "Test": history["test"][e],
                }
                for e in range(cfg.epochs)
            },
        }
        with open(os.path.join(results_dir, name + ".json"), "w") as f:
            json.dump(payload, f, indent=4)
        from debiasing_multi_modal_tpu.weights.convert import save_orbax

        save_orbax(
            {"params": best["params"], "batch_stats": best["stats"]},
            os.path.join(results_dir, name + ".ckpt"),
        )

    return (best_train, best_val, best_test), (ordered(zs_class), ordered(zs_spurious)), history


def encode_run_name(cfg: TrainConfig) -> str:
    """Encoded experiment filename (reference final_main.py:1070-1096)."""
    name = (
        f"im_clip_t_clip_class_tl_{cfg.tl_method}_t_{cfg.train_target}"
        f"_lr_{cfg.learning_rate}_bs_{cfg.batch_size}"
    )
    if "reg" in cfg.tl_method:
        name += f"_lrr{cfg.learning_rate_reg}_bsr_{cfg.batch_size_reg}"
        if cfg.balance_val:
            name += "_balval"
        if cfg.tl_method != "adapter_reg_seq_alter":
            name += "_CP" if cfg.use_cls_prompt_in_reg else "_GP"
        if cfg.add_adapter:
            name += "_MA" + ("+ni" if cfg.init_near_identity else "+rn")
        if cfg.continue_from_best and "seq" in cfg.tl_method:
            name += "_cont"
    if cfg.resample_ce:
        name += "_rs"
    return name
