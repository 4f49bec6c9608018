"""Fourth coverage-gap batch: contrastive degenerate-prediction paths (the
reference CRASHES on these — visualizer_supcon.py sample_positives), prefetch
guards and error propagation, and the native extension's build/writer error
paths.
"""

import os

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.contrastive import (
    _sample,
    construct_contrastive_rows,
    prepare_contrastive_points,
)
from debiasing_multi_modal_tpu.data.prefetch import prefetch


# ------------------------------------------------------------- contrastive ----


def test_sample_empty_pool_raises():
    with pytest.raises(ValueError, match="empty contrastive pool"):
        _sample(np.empty(0, np.int64), 3, np.random.default_rng(0))


def test_all_correct_predictions_has_no_anchors():
    labels = np.asarray([0, 1, 0, 1])
    points = prepare_contrastive_points(labels, labels.copy())
    with pytest.raises(ValueError, match="trains on ZS mistakes"):
        construct_contrastive_rows(points, 1, 1, 1, np.random.default_rng(0))


def test_class_without_correct_positives_errors():
    # every class-0 sample mispredicted: class 0 has no positive pool at all
    labels = np.asarray([0, 0, 1])
    preds = np.asarray([1, 1, 1])
    points = prepare_contrastive_points(labels, preds)
    with pytest.raises(ValueError, match="no anchor class has zero-shot"):
        construct_contrastive_rows(points, 1, 1, 1, np.random.default_rng(0))


def test_partial_degenerate_class_skips_with_warning():
    # slice pred=1 holds class-0 anchors with NO class-0 positives anywhere
    # (skipped, warned); slice pred=0 holds a class-1 anchor whose positives
    # and easy negatives exist -> one usable row survives
    labels = np.asarray([0, 1, 1, 0])
    preds = np.asarray([1, 1, 0, 1])
    points = prepare_contrastive_points(labels, preds)
    with pytest.warns(UserWarning, match="skipped 2 anchors"):
        rows = construct_contrastive_rows(
            points, 1, 1, 1, np.random.default_rng(0), shuffle=False
        )
    assert rows.shape == (1, 3)
    assert rows[0, 0] == 2  # the class-1 anchor


# ----------------------------------------------------------------- prefetch ----


def test_prefetch_guards_and_single_thread_order():
    with pytest.raises(ValueError, match="num_threads"):
        list(prefetch(range(3), depth=2, num_threads=0))
    assert list(prefetch(range(5), depth=2, num_threads=1)) == list(range(5))
    assert list(prefetch(range(5), depth=0)) == list(range(5))  # pass-through


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


# ------------------------------------------------------------------- native ----


def test_native_build_compiles_to_target(tmp_path, monkeypatch):
    import debiasing_multi_modal_tpu.native.ebdjson as ebd

    target = str(tmp_path / "libebdjson_test.so")
    monkeypatch.setattr(ebd, "_LIB_PATH", target)
    ebd._build()
    assert os.path.isfile(target) and os.path.getsize(target) > 0


def test_native_writer_unwritable_path_raises(tmp_path):
    import debiasing_multi_modal_tpu.native.ebdjson as ebd
    from debiasing_multi_modal_tpu.data.embeddings_store import EmbeddingTable

    table = EmbeddingTable(
        filenames=np.asarray(["a.jpg"]),
        y=np.zeros(1, np.int32),
        place=np.zeros(1, np.int32),
        group=np.zeros(1, np.int32),
        split=np.zeros(1, np.int32),
        y_pred=np.zeros(1, np.int32),
        embeddings=np.zeros((1, 4), np.float32),
    )
    # a directory path is unopenable for writing -> the rc != 0 error path
    with pytest.raises(Exception, match="ebdjson|writer|directory|rc"):
        ebd.save_embeddings_json(str(tmp_path), table, "waterbirds")
