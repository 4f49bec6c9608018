"""Sixth coverage-gap batch: quant-GEMM wrapper guards, packed host init,
thread-pool image decode, resample_ce minority branches, chained writer
diagnostics, tp validation, and small model-factory branches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# --------------------------------------------------------------- quant_gemm ----


def test_int8_matmul_guards():
    from debiasing_multi_modal_tpu.ops.quant_gemm import int8_matmul

    qx = np.ones((4, 8), np.int8)
    qk = np.ones((8, 128), np.int8)
    sx = np.ones((4, 1), np.float32)
    sk = np.ones(128, np.float32)
    with pytest.raises(ValueError, match="contraction mismatch"):
        int8_matmul(qx, np.ones((9, 128), np.int8), sx, sk, interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        int8_matmul(qx, np.ones((8, 64), np.int8), sx, np.ones(64, np.float32),
                    interpret=True)
    with pytest.raises(ValueError, match="multiple of 32"):
        int8_matmul(qx, qk, sx, sk, block_m=48, interpret=True)


def test_pick_block_divisibility():
    from debiasing_multi_modal_tpu.ops.quant_gemm import _pick_block

    assert _pick_block(1024, 512) == 512
    assert _pick_block(384, 512) == 128  # 512/256 don't divide, 128 does
    with pytest.raises(ValueError, match="no block size"):
        _pick_block(192, 512)  # nothing <= 512 in the ladder divides 192


# ------------------------------------------------------------------ packing ----


def test_packed_host_init_matches_direct_init():
    from debiasing_multi_modal_tpu.models import create_clip, init_clip
    from debiasing_multi_modal_tpu.models.config import CLIPConfig
    from debiasing_multi_modal_tpu.parallel.packing import packed_host_init

    cfg = CLIPConfig(
        name="tiny-vit", embed_dim=16, image_resolution=32, vision_layers=1,
        vision_width=64, vision_patch_size=16, transformer_width=32,
        transformer_heads=1, transformer_layers=1,
    )
    model = create_clip(cfg)
    packed = packed_host_init(model, batch=1, seed=0)
    direct = init_clip(model, jax.random.PRNGKey(0), batch=1)
    flat_p = jax.tree.leaves(packed)
    flat_d = jax.tree.leaves(direct)
    assert len(flat_p) == len(flat_d)
    for a, b in zip(flat_p, flat_d):
        # the default pack stages through a bf16 transfer buffer (tunnel
        # bandwidth policy) — equality holds to bf16 rounding
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=8e-3, atol=1e-6,
        )
        assert np.asarray(a).dtype == np.asarray(b).dtype


# ------------------------------------------------------------------- images ----


def test_thread_pool_decode_preserves_order(tmp_path):
    from PIL import Image

    from debiasing_multi_modal_tpu.data.groups import GroupTable
    from debiasing_multi_modal_tpu.data.images import image_batches

    rng = np.random.default_rng(0)
    n = 10
    arrays = []
    for i in range(n):
        arr = np.full((40, 40, 3), i * 20, np.uint8)
        arrays.append(arr)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")  # lossless
    meta = GroupTable(
        filenames=np.asarray([f"{i}.png" for i in range(n)]),
        y=np.zeros(n, np.int32), place=np.zeros(n, np.int32),
        split=np.zeros(n, np.int32), n_classes=2, n_places=2,
    )
    pooled = list(image_batches(meta, str(tmp_path), 4, host_resolution=None,
                                decode_workers=4))
    inline = list(image_batches(meta, str(tmp_path), 4, host_resolution=None,
                                decode_workers=1))
    assert len(pooled) == len(inline) == 3
    for (pa, pm), (ia, im) in zip(pooled, inline):
        np.testing.assert_array_equal(pa, ia)
        np.testing.assert_array_equal(pm["filenames"], im["filenames"])


# ----------------------------------------------------------------- samplers ----


def test_resample_ce_minor_class_branches():
    from debiasing_multi_modal_tpu.data.samplers import resampled_ce_weights

    # class 0 is the minority (2 vs 4) and class-correct ratios diverge
    labels = np.asarray([0, 0, 1, 1, 1, 1])
    preds = np.asarray([0, 1, 1, 1, 1, 0])  # class0: 1 correct; class1: 3
    w_bias = resampled_ce_weights(labels, preds, correct_class_bias=True)
    assert w_bias.shape == (6,)
    # the minority class got up-weighted relative to ones
    assert w_bias[labels == 0].max() > 1.0 or w_bias[labels == 1].max() > 1.0

    w_by_class = resampled_ce_weights(
        labels, preds, correct_class_bias=False, reweighting_by_class=True
    )
    assert (w_by_class[labels == 0] != 1.0).any()

    # mirrored labels flip the minor class to 1 (the other branch)
    w_flip = resampled_ce_weights(1 - labels, preds, correct_class_bias=True)
    assert w_flip.shape == (6,)


# -------------------------------------------------------------------- store ----


def test_writer_failure_chains_both_diagnostics(tmp_path, monkeypatch):
    from debiasing_multi_modal_tpu.data.embeddings_store import (
        EmbeddingTable,
        save_embeddings,
    )
    from debiasing_multi_modal_tpu.native import ebdjson

    monkeypatch.setattr(
        ebdjson, "save_embeddings_json",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("native boom")),
    )
    table = EmbeddingTable(
        filenames=np.asarray(["a.jpg"]), y=np.zeros(1, np.int32),
        place=np.zeros(1, np.int32), group=np.zeros(1, np.int32),
        split=np.zeros(1, np.int32), y_pred=np.zeros(1, np.int32),
        embeddings=np.zeros((1, 2), np.float32),
    )
    target = tmp_path / "outdir"
    target.mkdir()  # opening a directory for writing fails in the python path
    with pytest.raises(RuntimeError, match="native writer.*python writer"):
        save_embeddings(str(target), table, fmt="json")


# ----------------------------------------------------------------------- tp ----


def test_validate_tp_contract():
    from debiasing_multi_modal_tpu.models.config import CLIPConfig
    from debiasing_multi_modal_tpu.parallel.tp import validate_tp

    cfg = CLIPConfig(
        name="t", embed_dim=16, image_resolution=32, vision_layers=1,
        vision_width=32, vision_patch_size=16, transformer_width=32,
        transformer_heads=2, transformer_layers=1,
    )
    validate_tp(cfg, 1)  # no-op
    validate_tp(cfg, 2)  # divides both towers' heads
    with pytest.raises(ValueError):
        validate_tp(cfg, 3)


# ----------------------------------------------------------- model factories ----


def test_get_config_unknown_and_create_clip_dtype_override():
    from debiasing_multi_modal_tpu.models import create_clip
    from debiasing_multi_modal_tpu.models.config import CLIPConfig, get_config

    with pytest.raises(ValueError, match="unknown CLIP model"):
        get_config("RN9000")
    cfg = CLIPConfig(
        name="t", embed_dim=16, image_resolution=32, vision_layers=1,
        vision_width=32, vision_patch_size=16, transformer_width=32,
        transformer_heads=1, transformer_layers=1,
    )
    m = create_clip(cfg, dtype=jnp.bfloat16)
    assert m.config.dtype == jnp.bfloat16
    m2 = create_clip("ViT-B/32", dtype=jnp.bfloat16)
    assert m2.config.dtype == jnp.bfloat16 and m2.config.vision_patch_size == 32
