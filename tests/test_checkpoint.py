"""Checkpoint/resume tests: an interrupted run resumed from its checkpoint
reproduces the uninterrupted run exactly (params, history, best selection),
including across the two-phase/MultipleAdapter boundary."""

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table, train_all_epochs

BASE = dict(
    dataset="waterbirds",
    input_dim=32,
    adapter_feat_dim=8,
    batch_size=64,
    batch_size_reg=16,
    learning_rate=0.5,
    learning_rate_reg=0.5,
    lr_decay_epochs=(100,),
)


@pytest.fixture(scope="module")
def bundle():
    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=128, n_val=64, n_test=64, dim=32)
    )
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    return bundle_from_embedding_table(table, mbs, tc, ts, tg)


@pytest.mark.parametrize(
    "method,extra,interrupt",
    [
        ("adapter", {}, 3),
        (
            "adapter_reg_seq_alter",
            dict(epochs_feature_learning=3, add_adapter=True, balance_val=True),
            5,  # resume INSIDE phase 2 (switch at epoch 4)
        ),
        (
            # contrastive rows are drawn from the rng BEFORE restore; a
            # resumed run must train on the ORIGINAL rows (loop.py builds
            # them ahead of the checkpoint restore for exactly this reason)
            "contrastive_adapter",
            dict(learning_rate=0.02, num_positive=16, num_negative=16,
                 batch_factor=8),
            3,
        ),
        (
            # the notebook's linear projection head: its params + momentum
            # trace ride the checkpoint as `head_state` (loop.py payload)
            "contrastive_adapter",
            dict(learning_rate=0.02, num_positive=16, num_negative=16,
                 batch_factor=8, ca_head="linear"),
            3,
        ),
    ],
    ids=["adapter", "seq_alter_ma_phase2", "contrastive_rows", "ca_linear_head"],
)
def test_resume_reproduces_uninterrupted_run(tmp_path, bundle, method, extra, interrupt):
    cfg_full = TrainConfig(tl_method=method, epochs=7, **{**BASE, **extra})
    full = train_all_epochs(cfg_full, bundle, verbose=False)

    ckdir = str(tmp_path / "ck")
    # interrupted run: stops at `interrupt` epochs, checkpointing every epoch
    cfg_part = cfg_full.replace(epochs=interrupt)
    train_all_epochs(
        cfg_part, bundle, verbose=False, checkpoint_dir=ckdir, checkpoint_every=1
    )
    # resumed run to the full horizon
    resumed = train_all_epochs(
        cfg_full, bundle, verbose=False, checkpoint_dir=ckdir, resume=True,
        checkpoint_every=100,
    )

    (f_tr, f_va, f_te), (f_zc, f_zs), f_hist = full
    (r_tr, r_va, r_te), (r_zc, r_zs), r_hist = resumed
    assert len(r_hist["val"]) == len(f_hist["val"]) == 7
    for a, b in zip(f_hist["val"], r_hist["val"]):
        for k in a:
            assert abs(a[k] - b[k]) < 1e-6, (k, a, b)
    for k in f_te:
        assert abs(f_te[k] - r_te[k]) < 1e-6
    for k in f_zc:
        assert abs(f_zc[k] - r_zc[k]) < 1e-6


def test_latest_checkpoint_skips_half_written_dir(tmp_path):
    """A crash between the Orbax save and the host_meta.json write leaves a
    step dir without host_meta.json; latest_checkpoint must fall back to the
    newest COMPLETE step (and return None if none is complete)."""
    import json
    import os

    from debiasing_multi_modal_tpu.train.checkpoint import latest_checkpoint

    ckdir = tmp_path / "ck"
    (ckdir / "ep00002").mkdir(parents=True)  # half-written: no host_meta.json
    assert latest_checkpoint(str(ckdir)) is None

    (ckdir / "ep00001").mkdir()
    (ckdir / "ep00001" / "host_meta.json").write_text(json.dumps({}))
    got = latest_checkpoint(str(ckdir))
    assert got is not None and got.endswith("ep00001")


def test_bad_train_target_raises_before_silent_clamp(bundle):
    """train_target='group' yields labels 0..3 against a 2-column class text
    matrix; under jit the gather would clamp silently (the torch reference
    crashes in CrossEntropyLoss) — the loop must raise up front."""
    from debiasing_multi_modal_tpu.train.loop import train_all_epochs as tae

    cfg = TrainConfig(tl_method="adapter", epochs=1, train_target="group", **BASE)
    with pytest.raises(ValueError, match="train_target"):
        tae(cfg, bundle, verbose=False)


def test_latest_checkpoint_pruning(tmp_path, bundle):
    from debiasing_multi_modal_tpu.train.checkpoint import latest_checkpoint

    ckdir = str(tmp_path / "ck")
    cfg = TrainConfig(tl_method="adapter", epochs=5, **BASE)
    train_all_epochs(
        cfg, bundle, verbose=False, checkpoint_dir=ckdir, checkpoint_every=1
    )
    # keep=2 prunes older steps
    import os

    steps = sorted(os.listdir(ckdir))
    assert len(steps) == 2
    assert latest_checkpoint(ckdir).endswith("ep00005")


def test_pruning_ignores_half_written_dirs(tmp_path, bundle):
    """Half-written step dirs (no host_meta.json) must not count toward
    `keep`: a corrupt dir surviving while a complete checkpoint is deleted
    silently drops crash protection below keep=2.  Junk dirs are removed."""
    import os

    from debiasing_multi_modal_tpu.train.checkpoint import latest_checkpoint

    ckdir = tmp_path / "ck"
    # two stale half-written dirs sorting NEWER than real progress
    (ckdir / "ep00040").mkdir(parents=True)
    (ckdir / "ep00050").mkdir()
    cfg = TrainConfig(tl_method="adapter", epochs=4, **BASE)
    train_all_epochs(
        cfg, bundle, verbose=False, checkpoint_dir=str(ckdir),
        checkpoint_every=1,
    )
    steps = sorted(os.listdir(ckdir))
    # the two newest COMPLETE checkpoints survive; junk dirs are gone
    assert steps == ["ep00003", "ep00004"], steps
    assert latest_checkpoint(str(ckdir)).endswith("ep00004")
