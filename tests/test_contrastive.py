"""Contrastive machinery tests: slice/point construction semantics, row
layout, SupCon loss parity vs an explicit reference formula, and an e2e
contrastive fine-tune that improves minority-group separation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.data.contrastive import (
    compute_slices,
    construct_contrastive_rows,
    prepare_contrastive_points,
)
from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
from debiasing_multi_modal_tpu.models.adapter import AdapterMLP
from debiasing_multi_modal_tpu.train.contrastive import train_contrastive_epoch
from debiasing_multi_modal_tpu.train.losses import supcon_loss
from debiasing_multi_modal_tpu.train.steps import init_train_state, ones_mask


def test_compute_slices_partitions_by_prediction(rng):
    labels = rng.integers(0, 2, 50)
    preds = rng.integers(0, 2, 50)
    slices, correct = compute_slices(labels, preds)
    assert sum(len(s) for s in slices) == 50
    for s, c in zip(slices, correct):
        np.testing.assert_array_equal(preds[s] == labels[s], c)


def test_contrastive_points_semantics(rng):
    labels = rng.integers(0, 2, 200)
    preds = np.where(rng.random(200) < 0.8, labels, 1 - labels)
    pts = prepare_contrastive_points(labels, preds)
    for s in range(2):
        anchors = pts.slice_anchors[s]["ix"]
        # anchors are exactly the ZS-incorrect samples of the slice
        assert (preds[anchors] == s).all()
        assert (labels[anchors] != s).all()
    # easy negatives: the other slice's anchors appear in this slice's pool
    neg0 = set(pts.slice_negatives[0]["ix"].tolist())
    assert set(pts.slice_anchors[1]["ix"].tolist()) <= neg0
    # positives are correct samples keyed by class
    for c, pool in pts.positives_by_class.items():
        assert (labels[pool["ix"]] == c).all()
        assert (preds[pool["ix"]] == labels[pool["ix"]]).all()


def test_row_construction_layout(rng):
    labels = rng.integers(0, 2, 100)
    preds = np.where(rng.random(100) < 0.7, labels, 1 - labels)
    pts = prepare_contrastive_points(labels, preds)
    rows = construct_contrastive_rows(
        pts, num_anchor=2, num_positive=3, num_negative=4,
        rng=np.random.default_rng(0),
    )
    assert rows.shape[1] == 2 + 3 + 4
    for row in rows:
        anchor_cls = labels[row[0]]
        assert labels[row[1]] == anchor_cls  # extra anchor same class
        assert (labels[row[2:5]] == anchor_cls).all()  # positives same class
        assert preds[row[0]] != anchor_cls  # anchor was ZS-incorrect


def test_supcon_loss_matches_explicit_formula(rng):
    a = rng.standard_normal((3, 8)).astype(np.float32)
    p = rng.standard_normal((3, 4, 8)).astype(np.float32)
    n = rng.standard_normal((3, 5, 8)).astype(np.float32)
    tau = 0.1

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    losses = []
    for i in range(3):
        pos = (norm(p[i]) @ norm(a[i])) / tau
        neg = (norm(n[i]) @ norm(a[i])) / tau
        m = pos.max()
        ep, en = np.exp(pos - m), np.exp(neg - m)
        denom = ep.sum() + en.sum()
        losses.append((-(np.log(ep) - np.log(denom))).mean())
    expected = np.mean(losses)

    got = float(supcon_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), tau))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_all_correct_predictions_yield_clear_error():
    """100%-correct zero-shot predictions mean no anchors exist; the error
    must say so (found driving the CLI on a too-easy synthetic fixture —
    the old message claimed 'no correct samples', the opposite problem)."""
    labels = np.tile(np.array([0, 1]), 10)
    pts = prepare_contrastive_points(labels, labels.copy())
    with pytest.raises(ValueError, match="all correct"):
        construct_contrastive_rows(pts, 1, 2, 2, np.random.default_rng(0))


@pytest.mark.skipif(
    not __import__("os").path.isfile("/root/reference/demo/visualizer_supcon.py"),
    reason="needs the reference tree",
)
def test_supcon_loss_matches_reference_implementation(rng):
    """Cross-implementation oracle for the loss itself: the reference's OWN
    ``SupervisedContrastiveLoss`` (demo/visualizer_supcon.py:1522-1587),
    executed in a subprocess via tests/reference_oracle_runner.py, and our
    ``supcon_loss`` produce the same scalar on an identical
    [anchor; positives; negatives] batch."""
    import json
    import os
    import subprocess
    import sys

    P, N, D = 6, 5, 16
    tau = 0.07
    batch = rng.standard_normal((1 + P + N, D)).astype(np.float32)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = {
        "mode": "supcon_loss",
        "temperature": tau,
        "num_positive": P,
        "num_negative": N,
        "batch": batch.tolist(),
    }
    proc = subprocess.run(
        [sys.executable, "tests/reference_oracle_runner.py", json.dumps(spec)],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    lines = [
        l for l in proc.stdout.splitlines() if l.startswith("ORACLE_RESULT ")
    ]
    assert lines, proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    ref_loss = json.loads(lines[0][len("ORACLE_RESULT "):])["loss"]

    ours = float(
        supcon_loss(
            jnp.asarray(batch[0:1]),
            jnp.asarray(batch[1 : 1 + P][None]),
            jnp.asarray(batch[1 + P :][None]),
            tau,
        )
    )
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_contrastive_weight_scales_gradient(rng):
    """``contrastive_weight`` scales the SupCon gradient exactly (reference
    scales the loss by --contrastive_weight before backward,
    visualizer_supcon.py:477-479): one SGD step with momentum=0, wd=0 and
    weight 2w moves params twice as far as weight w (rtol covers XLA
    compiling a different fusion per static weight constant)."""
    emb = rng.standard_normal((32, 16)).astype(np.float32)
    rows = rng.integers(0, 32, (1, 2, 1 + 4 + 4))  # one step of 2 rows

    module = AdapterMLP(hidden_dim=8)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(emb[:2]), train=True)
    mask = ones_mask(variables["params"])

    deltas = {}
    for w in (0.5, 1.0):
        state = init_train_state(variables["params"], variables["batch_stats"])
        new_state, _ = train_contrastive_epoch(
            module, state, jnp.asarray(emb), jnp.asarray(rows),
            jnp.asarray([0.1], jnp.float32), mask,
            num_anchor=1, num_positive=4, num_negative=4,
            contrastive_weight=w, momentum=0.0, weight_decay=0.0,
        )
        deltas[w] = jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            new_state.params, state.params,
        )
    for d1, d05 in zip(jax.tree.leaves(deltas[1.0]), jax.tree.leaves(deltas[0.5])):
        assert np.abs(d1).max() > 0  # the step actually moved
        np.testing.assert_allclose(d1, 2.0 * d05, rtol=1e-4, atol=1e-7)


def test_ca_pre_norm_scale_invariance(rng):
    """With ca_pre_norm=True (the effective reference configuration,
    visualizer_supcon.py:258 + the notebook's forward_ca) the contrastive
    epoch is invariant to a global rescale of the embedding table; with
    ca_pre_norm=False the raw-scale path reacts to it."""
    emb = rng.standard_normal((32, 16)).astype(np.float32) * 3.0
    rows = rng.integers(0, 32, (2, 2, 1 + 4 + 4))

    module = AdapterMLP(hidden_dim=8)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(emb[:2]), train=True)
    mask = ones_mask(variables["params"])

    def losses(e, pre_norm):
        state = init_train_state(variables["params"], variables["batch_stats"])
        _, ls = train_contrastive_epoch(
            module, state, jnp.asarray(e), jnp.asarray(rows),
            jnp.asarray([0.1, 0.1], jnp.float32), mask,
            num_anchor=1, num_positive=4, num_negative=4,
            ca_pre_norm=pre_norm,
        )
        return np.asarray(ls)

    np.testing.assert_allclose(
        losses(emb, True), losses(emb * 7.0, True), rtol=1e-5
    )
    assert np.abs(losses(emb, True) - losses(emb, False)).max() > 1e-4


def test_contrastive_training_pulls_anchors_toward_positives():
    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=256, n_val=64, n_test=64, dim=32)
    )
    train_idx = np.where(meta.split == 0)[0]
    labels = meta.y[train_idx]
    preds = table.y_pred[train_idx]
    emb = table.embeddings[train_idx]

    pts = prepare_contrastive_points(labels, preds)
    rng = np.random.default_rng(0)
    A, P, N = 1, 8, 8
    rows = construct_contrastive_rows(pts, A, P, N, rng)
    rows_per_step = 4
    nb = len(rows) // rows_per_step
    rows = rows[: nb * rows_per_step].reshape(nb, rows_per_step, A + P + N)

    module = AdapterMLP(hidden_dim=16)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(emb[:2]), train=True)
    state = init_train_state(variables["params"], variables["batch_stats"])
    mask = ones_mask(variables["params"])

    def mean_loss(state):
        _, losses = train_contrastive_epoch(
            module, state, jnp.asarray(emb), jnp.asarray(rows),
            jnp.zeros(nb, jnp.float32),  # lr 0 -> pure evaluation
            mask, num_anchor=A, num_positive=P, num_negative=N,
        )
        return float(np.mean(np.asarray(losses)))

    before = mean_loss(state)
    for _ in range(5):
        state, losses = train_contrastive_epoch(
            module, state, jnp.asarray(emb), jnp.asarray(rows),
            jnp.full(nb, 0.05, jnp.float32), mask,
            num_anchor=A, num_positive=P, num_negative=N,
        )
    after = float(np.mean(np.asarray(losses)))
    assert after < before, (before, after)


def test_clamp_counts_shrinks_to_pools():
    """Reference adjust_num_pos_neg_ (SupCon.ipynb cell 6:41-66): requested
    counts shrink to the smallest pools instead of sampling duplicates."""
    import numpy as np

    from debiasing_multi_modal_tpu.data.contrastive import (
        clamp_counts,
        prepare_contrastive_points,
    )

    rng = np.random.default_rng(0)
    labels = np.array([0] * 20 + [1] * 20, np.int32)
    preds = labels.copy()
    preds[:3] = 1  # 3 anchors in slice "pred=1" with true class 0
    preds[20:25] = 0  # 5 anchors in slice "pred=0" with true class 1
    pts = prepare_contrastive_points(labels, preds)
    a, p, n = clamp_counts(pts, 2048, 2048, 2048)
    # positives: smallest non-empty class-positive pool;
    # negatives: smallest slice-negative pool; anchors <= min(p, n)
    pos_sizes = [len(d["ix"]) for d in pts.positives_by_class.values() if len(d["ix"])]
    neg_sizes = [len(d["ix"]) for d in pts.slice_negatives if len(d["ix"])]
    assert p == min(pos_sizes) and n == min(neg_sizes)
    assert a <= min(p, n) and a >= 1
    # requested counts below the pools pass through unchanged
    assert clamp_counts(pts, 1, 2, 3) == (1, 2, 3)
