"""End-to-end two-phase trainer tests on the synthetic spurious-correlation
fixture: the full method ladder runs, model selection works, and the
debiasing methods beat plain ERM on worst-group accuracy — the qualitative
shape of the reference's ablation table (SURVEY.md §6)."""

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import (
    DataBundle,
    SplitArrays,
    bundle_from_embedding_table,
    encode_run_name,
    train_all_epochs,
)


def _bundle(spec=None):
    import jax.numpy as jnp

    meta, table, text_class, text_group, text_spurious = make_synthetic_dataset(
        spec or SyntheticSpec()
    )
    meta_by_split = {
        name: meta.take(np.where(meta.split == sid)[0])
        for name, sid in (("train", 0), ("val", 1), ("test", 2))
    }
    return bundle_from_embedding_table(
        table, meta_by_split, text_class, text_spurious, text_group
    )


BASE = dict(
    dataset="waterbirds",
    input_dim=64,
    adapter_feat_dim=16,
    batch_size=128,
    batch_size_reg=32,
    learning_rate=0.5,
    learning_rate_reg=0.5,
    lr_decay_epochs=(100,),
    random_seed=42,
)


@pytest.fixture(scope="module")
def bundle():
    return _bundle()


def test_linear_probing_runs(bundle):
    cfg = TrainConfig(tl_method="linear_probing", epochs=3, **BASE)
    (tr, va, te), (zs_c, zs_s), hist = train_all_epochs(cfg, bundle, verbose=False)
    assert 0 <= te["worst_acc"] <= 1
    assert len(hist["val"]) == 3
    # linear_probing ZS probe is the raw CLIP baseline — biased on synthetic
    assert zs_c["worst_acc"] < 0.7


def test_erm_adapter_is_biased(bundle):
    cfg = TrainConfig(tl_method="adapter", epochs=8, **BASE)
    (tr, va, te), _, _ = train_all_epochs(cfg, bundle, verbose=False)
    # strong spurious cue: excellent train-distribution-weighted accuracy,
    # collapsed worst group (the test split is group-balanced)
    assert te["weighted_mean_acc"] > 0.85
    assert te["worst_acc"] < 0.5


@pytest.mark.parametrize("method", ["adapter_reg_seq", "adapter_reg_seq_alter"])
def test_two_phase_debiasing_beats_erm(bundle, method):
    erm = TrainConfig(tl_method="adapter", epochs=6, **BASE)
    (_, _, te_erm), _, _ = train_all_epochs(erm, bundle, verbose=False)

    cfg = TrainConfig(
        tl_method=method,
        epochs=16,
        epochs_feature_learning=6,
        balance_val=True,
        warm_reg=True,
        **BASE,
    )
    (tr, va, te), (zs_c, zs_s), hist = train_all_epochs(cfg, bundle, verbose=False)
    assert te["worst_acc"] >= te_erm["worst_acc"], (te, te_erm)
    assert te["worst_acc"] > 0.6


def test_multiple_adapter_path(bundle):
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=24,
        epochs_feature_learning=6,
        add_adapter=True,
        init_near_identity=True,
        continue_from_best=True,
        balance_val=True,
        **BASE,
    )
    (tr, va, te), (zs_c, zs_s), hist = train_all_epochs(cfg, bundle, verbose=False)
    # the frozen 0.5-blended old branch caps the recovery rate; with ~9 group
    # epochs the worst group must clearly improve over the collapsed ERM model
    assert te["worst_acc"] > 0.3
    # zs class probe of the best (multiple-adapter) model equals its test acc shape
    assert set(zs_c) >= {"worst_acc", "mean_acc", "weighted_mean_acc"}


def test_adapter_reg_interleaved(bundle):
    cfg = TrainConfig(tl_method="adapter_reg", epochs=6, **BASE)
    (_, _, te), _, _ = train_all_epochs(cfg, bundle, verbose=False)
    assert te["mean_acc"] > 0.6


def test_resample_ce_path(bundle):
    cfg = TrainConfig(tl_method="adapter", epochs=6, resample_ce=True, **BASE)
    (_, _, te), _, _ = train_all_epochs(cfg, bundle, verbose=False)
    assert te["mean_acc"] > 0.6


def test_save_results_schema(tmp_path, bundle):
    import json

    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=4,
        epochs_feature_learning=2,
        add_adapter=True,
        save_results=True,
        **BASE,
    )
    train_all_epochs(cfg, bundle, verbose=False, results_dir=str(tmp_path))
    name = encode_run_name(cfg)
    assert name.endswith("_MA+rn")
    payload = json.loads((tmp_path / (name + ".json")).read_text())
    assert set(payload) == {
        "Final Results (best epoch)",
        "Feature Quality (using zs)",
        "All Results (all epoch)",
    }
    epochs = payload["All Results (all epoch)"]
    assert len(epochs) == 4
    rec = epochs["Epoch 1"]["Test"]
    assert "worst_acc" in rec and "weighted_mean_acc" in rec


def test_determinism_same_seed(bundle):
    cfg = TrainConfig(tl_method="adapter", epochs=3, **BASE)
    r1 = train_all_epochs(cfg, bundle, verbose=False)
    r2 = train_all_epochs(cfg, bundle, verbose=False)
    assert r1[0] == r2[0]


def test_contrastive_adapter_method(bundle):
    """tl_method='contrastive_adapter' follows the working reference CA flow
    (workspace/jinsu/SupCon.ipynb cell 7): each epoch is a SupCon epoch plus
    an interleaved CE epoch.  The contrastive loss decreases across epochs,
    the CE anchor keeps the ZS head meaningful, and the full eval/selection
    plumbing runs."""
    base = dict(BASE)
    base["learning_rate"] = 0.02
    cfg = TrainConfig(
        tl_method="contrastive_adapter", epochs=5,
        num_positive=16, num_negative=16, batch_factor=8,
        **base,
    )
    (_, _, te), _, hist = train_all_epochs(cfg, bundle, verbose=False)
    assert len(hist["val"]) == 5
    assert len(hist["cl_loss"]) == 5
    assert hist["cl_loss"][-1] < hist["cl_loss"][0], hist["cl_loss"]
    assert set(te) >= {"worst_acc", "mean_acc"}
    # the interleaved CE epochs train the ZS head for real
    assert te["mean_acc"] > 0.5, te


def test_contrastive_adapter_ce_update_modes(bundle):
    """ca_ce_update modes: 0 = pure SupCon (no CE pass — without the text
    anchor the train metrics come from the ZS eval pass), N>0 caps the CE
    pass at N batches (the intent of visualizer_supcon.py:354, whose
    opt.ce_update attribute is never defined — latent reference bug)."""
    base = dict(BASE)
    base["learning_rate"] = 0.02
    cfg = TrainConfig(
        tl_method="contrastive_adapter", epochs=2,
        num_positive=8, num_negative=8, batch_factor=4,
        **base,
    )
    for mode in (0, 1):
        (_, _, te), _, hist = train_all_epochs(
            cfg.replace(ca_ce_update=mode), bundle, verbose=False
        )
        assert len(hist["cl_loss"]) == 2
        assert set(te) >= {"worst_acc", "mean_acc"}


def test_feature_learning_zero_means_stage2_from_epoch_one(bundle):
    """epochs_feature_learning=0 is a REAL value, not a falsy None: the
    reference's stage switch is `epoch <= opt.epochs_feature_learning`
    (final_main.py:933), so 0 puts every epoch in the reg phase.  A `cfg or`
    fallback silently trained ALL epochs as plain ERM instead."""
    from debiasing_multi_modal_tpu.sweep.runner import run_seeds

    common = dict(tl_method="adapter_reg_seq", epochs=6, balance_val=True,
                  **BASE)
    all_reg = TrainConfig(epochs_feature_learning=0, **common)
    (_, _, te0), _, hist0 = train_all_epochs(all_reg, bundle, verbose=False)
    # phase 1 never runs: trajectory must differ from the all-phase-1 run
    all_erm = TrainConfig(epochs_feature_learning=6, **common)
    (_, _, te6), _, hist6 = train_all_epochs(all_erm, bundle, verbose=False)
    v0 = [h["mean_acc"] for h in hist0["val"]]
    v6 = [h["mean_acc"] for h in hist6["val"]]
    assert v0 != v6, "feat=0 trained identically to feat=epochs (falsy-zero)"
    # sweep-equivalence: vmapped honors the same semantics
    seq = run_seeds(all_reg, bundle, [42], use_vmap=False)
    vm = run_seeds(all_reg, bundle, [42], use_vmap=True)
    for a, b in zip(seq[0][0], vm[0][0]):
        for k in a:
            assert abs(a[k] - b[k]) < 1e-5, (k, a, b)


def test_epochs_zero_rejected():
    with pytest.raises(ValueError, match="epochs"):
        TrainConfig(tl_method="adapter", epochs=0, **BASE)


def test_checkpoint_every_zero_means_final_only(tmp_path, bundle):
    """checkpoint_every=0 disables periodic checkpoints (final epoch only)
    instead of ZeroDivisionError."""
    cfg = TrainConfig(tl_method="adapter", epochs=3, **BASE)
    train_all_epochs(
        cfg, bundle, verbose=False, checkpoint_dir=str(tmp_path),
        checkpoint_every=0,
    )
    import os as _os

    steps = [d for d in _os.listdir(tmp_path) if d.startswith("ep")]
    assert steps == ["ep00003"], steps


def test_group_label_width_guard(bundle):
    """Group labels exceeding text_group's column count raise instead of
    silently clamping in the jitted gather (both loops)."""
    import dataclasses as _dc

    from debiasing_multi_modal_tpu.sweep.runner import run_seeds

    bad = _dc.replace(bundle, text_group=bundle.text_group[:, :2])
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=4, epochs_feature_learning=2,
        **BASE,
    )
    with pytest.raises(ValueError, match="group text matrix"):
        train_all_epochs(cfg, bad, verbose=False)
    with pytest.raises(ValueError, match="group text matrix"):
        run_seeds(cfg, bad, [42], use_vmap=True)


def test_contrastive_head_notebook_flow(bundle):
    """The notebook's full CA configuration (ca_head='linear' projection,
    per-row stepping via batch_factor=1, unscaled loss — SupCon.ipynb cells
    0/3): trains, the CL loss decreases, and the head demonstrably changes
    the trajectory vs the headless run.  Sequential == vmapped pins the
    sweep path (CLAUDE.md sweep-equivalence rule)."""
    from debiasing_multi_modal_tpu.sweep.runner import run_seeds

    base = dict(BASE)
    base["learning_rate"] = 0.02
    common = dict(
        tl_method="contrastive_adapter", epochs=3,
        num_positive=16, num_negative=16, batch_factor=1,
        contrastive_weight=1.0, **base,
    )
    headless = TrainConfig(**common)
    headed = TrainConfig(ca_head="linear", ca_feat_dim=32, **common)
    (_, _, te0), _, h0 = train_all_epochs(headless, bundle, verbose=False)
    (_, _, te1), _, h1 = train_all_epochs(headed, bundle, verbose=False)
    assert h1["cl_loss"][-1] < h1["cl_loss"][0], h1["cl_loss"]
    assert h0["cl_loss"] != h1["cl_loss"], "head had no effect on training"
    seq = run_seeds(headed, bundle, [42], use_vmap=False)
    vm = run_seeds(headed, bundle, [42], use_vmap=True)
    for a, b in zip(seq[0][0], vm[0][0]):
        for k in a:
            assert abs(a[k] - b[k]) < 1e-5, (k, a, b)
