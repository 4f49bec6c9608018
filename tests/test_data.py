"""Data-layer tests: metadata parsing, embedding store round-trips (npz and
reference-JSON schema), consistency asserts, and sampler semantics."""

import json
import os

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.embeddings_store import (
    EmbeddingTable,
    load_embeddings,
    load_text_embeddings,
    save_embeddings,
    save_text_embeddings,
)
from debiasing_multi_modal_tpu.data.groups import (
    GroupTable,
    group_to_y_p,
    load_waterbirds_metadata,
)
from debiasing_multi_modal_tpu.data.samplers import (
    balanced_subset_indices,
    epoch_plan,
    make_batch_plan,
    resampled_ce_weights,
    stratified_split_indices,
    weighted_sample_indices,
)
from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset


def _write_waterbirds_csv(tmp_path, n=20, seed=0):
    rng = np.random.default_rng(seed)
    rows = ["img_id,img_filename,y,split,place,place_filename"]
    for i in range(n):
        y, split, place = rng.integers(0, 2), rng.integers(0, 3), rng.integers(0, 2)
        rows.append(f"{i},cls/{i:04d}.jpg,{y},{split},{place},bg/{i}.jpg")
    (tmp_path / "metadata.csv").write_text("\n".join(rows) + "\n")
    return tmp_path


def test_waterbirds_metadata_parsing(tmp_path):
    _write_waterbirds_csv(tmp_path)
    full = load_waterbirds_metadata(str(tmp_path))
    train = load_waterbirds_metadata(str(tmp_path), "train")
    assert len(full) == 20
    assert (train.split == 0).all()
    assert (full.group == full.y * 2 + full.place).all()
    assert full.group_counts.sum() == 20
    np.testing.assert_allclose(full.group_ratio.sum(), 1.0, rtol=1e-6)
    assert group_to_y_p(3) == (1, 1) and group_to_y_p(2) == (1, 0)


def test_embedding_store_roundtrip(tmp_path):
    meta, table, *_ = make_synthetic_dataset(SyntheticSpec(n_train=32, n_val=16, n_test=16))
    npz = str(tmp_path / "clip.npz")
    js = str(tmp_path / "clip.json")
    save_embeddings(npz, table)
    save_embeddings(js, table, fmt="json", dataset="waterbirds")

    for path in (npz, js):
        loaded = load_embeddings(path, dataset="waterbirds")
        np.testing.assert_array_equal(loaded.y, table.y)
        np.testing.assert_array_equal(loaded.group, table.group)
        np.testing.assert_allclose(loaded.embeddings, table.embeddings, rtol=1e-6)

    # the JSON matches the reference's record schema
    raw = json.loads((tmp_path / "clip.json").read_text())
    rec = next(iter(raw.values()))
    assert set(rec) == {"y", "place", "group", "split", "image_embedding", "y_pred"}
    assert isinstance(rec["y"], str)  # reference stores stringified labels


def test_align_to_detects_label_mismatch():
    meta, table, *_ = make_synthetic_dataset(SyntheticSpec(n_train=32, n_val=16, n_test=16))
    train_meta = meta.take(np.where(meta.split == 0)[0])
    aligned = table.align_to(train_meta)
    assert (aligned.filenames == train_meta.filenames).all()

    bad = GroupTable(
        filenames=train_meta.filenames,
        y=1 - train_meta.y,  # corrupted labels
        place=train_meta.place,
        split=train_meta.split,
    )
    with pytest.raises(ValueError, match="inconsistency"):
        table.align_to(bad)


def test_text_embedding_roundtrip(tmp_path):
    emb = np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32)
    path = str(tmp_path / "clip_class.json")
    save_text_embeddings(path, ["a photo of a landbird.", "a photo of a waterbird."], emb)
    loaded = load_text_embeddings(path)
    assert loaded.shape == (8, 2)  # [D, C] column-stacked like the reference
    np.testing.assert_allclose(loaded, emb.T, rtol=1e-6)


def test_stratified_split_preserves_group_proportions():
    groups = np.repeat([0, 1, 2, 3], [100, 50, 30, 20])
    reg, val = stratified_split_indices(groups, 0.5, seed=42)
    assert len(reg) + len(val) == 200
    assert set(reg) & set(val) == set()
    for g, n in zip(range(4), (100, 50, 30, 20)):
        assert abs((groups[reg] == g).sum() - n // 2) <= 1
    # deterministic under the fixed seed
    reg2, _ = stratified_split_indices(groups, 0.5, seed=42)
    np.testing.assert_array_equal(reg, reg2)


def test_balanced_subset_interleaves_groups():
    groups = np.repeat([0, 1, 2, 3], [40, 30, 20, 10])
    idx = balanced_subset_indices(groups, np.random.default_rng(0))
    assert len(idx) == 40  # 4 groups x min size 10
    # round-robin interleave: first 4 samples cover all groups, in order
    np.testing.assert_array_equal(groups[idx[:4]], [0, 1, 2, 3])
    counts = np.bincount(groups[idx], minlength=4)
    np.testing.assert_array_equal(counts, [10, 10, 10, 10])


def test_resampled_ce_weights_balances_correct_incorrect():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 1000)
    # class-conditional zero-shot accuracy: 90% correct
    preds = np.where(rng.random(1000) < 0.9, labels, 1 - labels)
    w = resampled_ce_weights(labels, preds)
    # expected: incorrect samples carry ~9x weight
    incorrect = preds != labels
    assert w[incorrect].min() > 5
    assert (w[~incorrect & (labels == labels)] >= 1).all()
    # weighted resample roughly balances correct vs incorrect per class
    samp = weighted_sample_indices(w, 20000, rng)
    frac_incorrect = incorrect[samp].mean()
    assert 0.4 < frac_incorrect < 0.6


def test_batch_plan_padding_and_mask():
    plan = make_batch_plan(np.arange(10), 4)
    assert plan.indices.shape == (3, 4)
    assert plan.num_examples == 10
    assert plan.mask[-1].tolist() == [True, True, False, False]
    dropped = make_batch_plan(np.arange(10), 4, drop_last=True)
    assert dropped.indices.shape == (2, 4) and dropped.mask.all()

    rng = np.random.default_rng(0)
    p1 = epoch_plan(10, 4, shuffle=True, rng=np.random.default_rng(1))
    p2 = epoch_plan(10, 4, shuffle=True, rng=np.random.default_rng(1))
    np.testing.assert_array_equal(p1.indices, p2.indices)
    assert sorted(p1.indices[p1.mask].tolist()) == list(range(10))
