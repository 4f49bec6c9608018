"""Seventh coverage-gap batch: the reg-phase cosine schedule (the reference's
typo-crashed branch, demo/util.py:84-96 — reproduced FIXED per PARITY), the
CAEncoder head-mode guard, and the sequential interleaved adapter_reg epoch
with class prompts (whose train+reg meters merge, final_main.py:536,551).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.schedules import epoch_lr_reg


def test_epoch_lr_reg_cosine_matches_reference_formula():
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=20, epochs_feature_learning=10,
        cosine=True, learning_rate_reg=0.8, lr_decay_rate=0.1,
    )
    span = 20 - 10
    eta_min = 0.8 * 0.1 ** 3
    for epoch in (0, 3, 9):
        want = eta_min + (0.8 - eta_min) * (1 + math.cos(math.pi * epoch / span)) / 2
        assert float(epoch_lr_reg(cfg, epoch)) == pytest.approx(want)


def test_ca_encoder_head_guard_and_linear_dim():
    from debiasing_multi_modal_tpu.models.adapter import CAEncoder

    x = jnp.ones((4, 16), jnp.float32)
    bogus = CAEncoder(hidden_dim=8, ca_head="mlp")
    with pytest.raises(ValueError, match="unknown ca_head"):
        bogus.init(jax.random.PRNGKey(0), x)
    linear = CAEncoder(hidden_dim=8, ca_head="linear", ca_feat_dim=12)
    vars_ = linear.init(jax.random.PRNGKey(0), x)
    out = linear.apply(vars_, x)
    assert out.shape == (4, 12)
    none_head = CAEncoder(hidden_dim=8, ca_head=None)
    vars_n = none_head.init(jax.random.PRNGKey(0), x)
    assert none_head.apply(vars_n, x).shape == (4, 16)


def test_sequential_adapter_reg_with_class_prompt_merges_meters():
    """CP-Alter (adapter_reg + use_cls_prompt_in_reg) in the SEQUENTIAL loop:
    the class-prompt reg pass accumulates into the train meters (the
    reference updates one meter set across both loaders)."""
    from debiasing_multi_modal_tpu.data.synthetic import (
        SyntheticSpec,
        make_synthetic_dataset,
    )
    from debiasing_multi_modal_tpu.train.loop import (
        bundle_from_embedding_table,
        train_all_epochs,
    )

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=96, n_val=48, n_test=48, dim=16)
    )
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    bundle = bundle_from_embedding_table(table, mbs, tc, ts, tg)
    cfg = TrainConfig(
        tl_method="adapter_reg", epochs=2, use_cls_prompt_in_reg=True,
        dataset="waterbirds", input_dim=16, adapter_feat_dim=8,
        batch_size=32, batch_size_reg=16, learning_rate=0.5,
        learning_rate_reg=0.5, lr_decay_epochs=(100,),
    )
    (_, _, best_test), _, history = train_all_epochs(cfg, bundle, verbose=False)
    assert len(history["train"]) == 2
    for row in history["train"]:
        assert 0.0 <= row["worst_acc"] <= 1.0
        assert row["mean_acc"] >= 0.0
    assert 0.0 <= best_test["mean_acc"] <= 1.0


def test_train_seeds_vmapped_grid_guards():
    from debiasing_multi_modal_tpu.data.synthetic import (
        SyntheticSpec,
        make_synthetic_dataset,
    )
    from debiasing_multi_modal_tpu.sweep.vmap_loop import train_seeds_vmapped
    from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=64, n_val=32, n_test=32, dim=16)
    )
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    bundle = bundle_from_embedding_table(table, mbs, tc, ts, tg)
    cfg = TrainConfig(
        tl_method="adapter", epochs=1, dataset="waterbirds", input_dim=16,
        adapter_feat_dim=8, batch_size=32, batch_size_reg=16,
        learning_rate=0.5, learning_rate_reg=0.5, lr_decay_epochs=(100,),
    )
    with pytest.raises(ValueError, match="not both"):
        train_seeds_vmapped(
            cfg, bundle, [42], lr_grid=[(0.1, 0.1)], cell_grid=[cfg]
        )
    with pytest.raises(ValueError, match="may differ from the base config"):
        train_seeds_vmapped(
            cfg, bundle, [42], cell_grid=[cfg.replace(epochs=2)]
        )


def test_dot_product_attention_explicit_pallas_on_cpu():
    """impl="pallas" off-TPU auto-resolves to interpret mode (instead of a
    Mosaic lowering failure) and matches the XLA path."""
    from debiasing_multi_modal_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 16, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 16, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 16, 2, 8)), jnp.float32)
    out_xla = dot_product_attention(q, k, v, impl="xla")
    out_pal = dot_product_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=2e-5, atol=2e-5)
    causal_xla = dot_product_attention(q, k, v, impl="xla", causal=True)
    causal_pal = dot_product_attention(q, k, v, impl="pallas", causal=True)
    np.testing.assert_allclose(np.asarray(causal_pal), np.asarray(causal_xla),
                               rtol=2e-5, atol=2e-5)
