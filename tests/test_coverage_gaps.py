"""Tests for paths the stdlib coverage sweep (scripts/stdlib_coverage.py)
found unexercised by the rest of the suite: host-side meters/timing gauges,
the TrainConfig cosine warmup targets, the pure-Python clip.json writer
fallback, seed utilities, the attention dispatch branch selection, and the
bicubic resize kernel.

Reference parity surfaces covered here: AverageMeter (demo/util.py:18-33),
warmup_learning_rate{,_reg} targets (demo/util.py:99-115), the clip.json
schema writer (clip_inference.py:159-271), set_seed (demo/util.py:61-68),
and CLIP's bicubic Resize (clip/clip.py:79-86).
"""

import math

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.embeddings_store import (
    EmbeddingTable,
    load_embeddings,
    save_embeddings,
)
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.utils.meters import AverageMeter, StepTimer
from debiasing_multi_modal_tpu.utils.seed import set_seed


def test_average_meter_semantics():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    # reference demo/util.py:18-33: val is last, avg is count-weighted
    assert m.val == 4.0
    assert m.count == 4
    assert m.avg == pytest.approx((2.0 + 4.0 * 3) / 4)
    m.reset()
    assert m.count == 0 and m.sum == 0.0 and m.avg == 0.0


def test_step_timer_phases_and_summary():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.meters["a"].count == 2 and t.meters["b"].count == 1
    s = t.summary()
    assert "a " in s and "b " in s and "s (" in s


def test_timing_gauges_run_on_cpu():
    from debiasing_multi_modal_tpu.utils.timing import (
        measure_download_ms,
        measure_upload_ms,
    )

    up = measure_upload_ms(np.zeros((4, 8, 8, 3), np.uint8), iters=2)
    assert np.isfinite(up) and up >= 0.0

    import jax.numpy as jnp

    down = measure_download_ms(
        lambda: [jnp.arange(64, dtype=jnp.float32) + 0.0], iters=2
    )
    assert np.isfinite(down) and down >= 0.0


def _cosine_target(lr, decay_rate, warm_epochs, span):
    # the reference's warmup target: the cosine schedule value at the end of
    # warmup (demo/util.py:99-115 referencing adjust_learning_rate{,_reg})
    eta_min = lr * (decay_rate ** 3)
    return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * warm_epochs / span)) / 2


def test_cosine_warmup_targets_match_reference_formula():
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=100,
        epochs_feature_learning=40,
        cosine=True,
        warm=True,
        warm_reg=True,
        learning_rate=1.0,
        learning_rate_reg=0.5,
        lr_decay_rate=0.1,
    )
    assert cfg.warmup_to == pytest.approx(
        _cosine_target(1.0, 0.1, cfg.warm_epochs, 100)
    )
    assert cfg.warmup_to_reg == pytest.approx(
        _cosine_target(0.5, 0.1, cfg.warm_epochs_reg, 100 - 40)
    )


def test_cosine_warmup_step_branch_targets():
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=100,
        epochs_feature_learning=40,
        cosine=False,
        learning_rate=2.0,
        learning_rate_reg=0.25,
    )
    assert cfg.warmup_to == 2.0
    assert cfg.warmup_to_reg == 0.25


def test_cosine_reg_warmup_zero_span_raises():
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter",
        epochs=40,
        epochs_feature_learning=40,  # phase 2 never starts: span == 0
        cosine=True,
    )
    with pytest.raises(ValueError, match="cosine reg warmup"):
        cfg.warmup_to_reg


def _tiny_table(n=5, d=8):
    rng = np.random.default_rng(0)
    return EmbeddingTable(
        filenames=np.asarray([f"imgs/{i:05d}.jpg" for i in range(n)]),
        y=rng.integers(0, 2, n).astype(np.int32),
        place=rng.integers(0, 2, n).astype(np.int32),
        group=rng.integers(0, 4, n).astype(np.int32),
        split=rng.integers(0, 3, n).astype(np.int32),
        y_pred=rng.integers(0, 2, n).astype(np.int32),
        embeddings=rng.standard_normal((n, d)).astype(np.float32),
    )


def test_json_writer_python_fallback_roundtrip(tmp_path, monkeypatch):
    """When the native writer fails, the pure-Python clip.json writer must
    produce a loadable, equivalent cache (embeddings_store.py fallback)."""
    from debiasing_multi_modal_tpu.native import ebdjson

    def boom(*a, **kw):
        raise RuntimeError("forced native failure")

    monkeypatch.setattr(ebdjson, "save_embeddings_json", boom)
    table = _tiny_table()
    path = str(tmp_path / "clip.json")
    save_embeddings(path, table, fmt="json", dataset="waterbirds")
    back = load_embeddings(path, dataset="waterbirds")
    order = np.argsort(back.filenames)
    ref_order = np.argsort(table.filenames)
    assert (back.filenames[order] == table.filenames[ref_order]).all()
    assert (back.y[order] == table.y[ref_order]).all()
    assert (back.group[order] == table.group[ref_order]).all()
    np.testing.assert_allclose(
        back.embeddings[order], table.embeddings[ref_order], rtol=1e-6
    )


def test_set_seed_deterministic():
    rng1, key1 = set_seed(7)
    rng2, key2 = set_seed(7)
    assert rng1.integers(0, 1 << 30) == rng2.integers(0, 1 << 30)
    assert (np.asarray(key1) == np.asarray(key2)).all()
    # the global numpy stream is seeded too (reference set_seed semantics)
    np.random.seed(7)
    expect = np.random.random()
    set_seed(7)
    assert np.random.random() == expect


def test_attention_dispatch_selects_pallas_on_tpu(monkeypatch):
    """The auto/pallas branches of dot_product_attention: with a mocked TPU
    backend and a qualifying shape, dispatch must route to flash_attention."""
    import debiasing_multi_modal_tpu.ops.attention as attn_mod
    from debiasing_multi_modal_tpu.ops import flash_attention as fa

    q = np.zeros((1, 8, 2, 4), np.float32)
    calls = {}

    def fake_flash(qq, kk, vv, *, mask=None, causal=False):
        calls["hit"] = True
        return attn_mod._xla_attention(qq, kk, vv, mask=mask, causal=causal)

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(fa, "supported", lambda *a, **kw: True)
    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    out = attn_mod.dot_product_attention(q, q, q, impl="auto")
    assert calls.get("hit") and out.shape == q.shape

    calls.clear()
    out = attn_mod.dot_product_attention(q, q, q, impl="pallas")
    assert calls.get("hit") and out.shape == q.shape


def test_bicubic_resize_matrix_matches_pil():
    """resize_matrix(method='bicubic') against PIL's BICUBIC resampling —
    the kernel behind CLIP's own Resize (clip/clip.py:79-86)."""
    from PIL import Image

    from debiasing_multi_modal_tpu.ops.preprocess import resize_matrix

    rng = np.random.default_rng(3)
    img = (rng.random((32, 32)) * 255).astype(np.uint8)
    target = 16
    pil = np.asarray(
        Image.fromarray(img).resize((target, target), Image.BICUBIC),
        np.float32,
    )
    # PIL's resize always antialiases on downscale (Pillow >= 2.7)
    m = resize_matrix(32, target, antialias=True, method="bicubic")
    ours = np.clip(m @ img.astype(np.float32) @ m.T, 0, 255)
    # PIL quantizes to uint8 at each separable pass; allow ~1 level plus
    # kernel-edge differences
    assert np.abs(ours - pil).mean() < 1.0
    assert np.abs(ours - pil).max() <= 3.0
