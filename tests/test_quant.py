"""Numerics pins for the opt-in int8 W8A8 path (ops/quant.py).

The reference has no quantized path (it runs fp16 CUDA towers,
clip/model.py:375-396); this is a TPU-side performance lever, so the tests
pin (a) the op-level error bound, (b) degenerate-input safety, (c) that a
quantized tower's variable tree is IDENTICAL to the bf16 tower's (converted
checkpoints load into both), and (d) the full-tower embedding agreement
bound vs the unquantized path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debiasing_multi_modal_tpu.models.clip import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import get_config
from debiasing_multi_modal_tpu.ops.quant import (
    Int8Dense,
    int8_dense,
    quantize_cols_int8,
    quantize_rows_int8,
)


def test_int8_dense_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    exact = x @ k + b
    quant = int8_dense(x, k, b)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    # two symmetric int8 quantizations of well-spread Gaussian data: ~1e-2
    assert rel < 0.02, rel


def test_int8_dense_exact_on_representable_values():
    # integers <= 127 with max exactly 127 quantize losslessly (scale 1.0),
    # so the int32-accumulated GEMM must be EXACT — pins the scale formula
    # and the round-trip arithmetic, not just a statistical bound
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, size=(16, 32)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, size=(32, 8)), jnp.float32)
    # pin every row amax (x) and column amax (k) to exactly 127 -> scales 1.0
    x = x.at[:, 0].set(127.0)
    k = k.at[0, :].set(127.0)
    np.testing.assert_array_equal(
        np.asarray(int8_dense(x, k)), np.asarray(x @ k)
    )


def test_quantize_handles_zero_rows_and_columns():
    q, s = quantize_rows_int8(jnp.zeros((4, 16), jnp.bfloat16))
    assert not np.isnan(np.asarray(s, np.float32)).any()
    np.testing.assert_array_equal(np.asarray(q), 0)
    qc, sc = quantize_cols_int8(jnp.zeros((16, 4), jnp.float32))
    assert not np.isnan(np.asarray(sc)).any()
    out = int8_dense(jnp.zeros((2, 16)), jnp.zeros((16, 4)))
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_int8_dense_matches_nn_dense_param_tree():
    import flax.linen as nn

    x = jnp.ones((2, 8), jnp.float32)
    v_q = Int8Dense(4).init(jax.random.PRNGKey(0), x)
    v_d = nn.Dense(4).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_q) == jax.tree_util.tree_structure(v_d)
    for a, b in zip(jax.tree_util.tree_leaves(v_q), jax.tree_util.tree_leaves(v_d)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_dense_output_dtype_follows_dtype_field():
    x = jnp.ones((2, 8), jnp.bfloat16)
    mod = Int8Dense(4, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(v, x).dtype == jnp.bfloat16


def _tiny_vit_config():
    cfg = get_config("ViT-B/32")
    import dataclasses

    return dataclasses.replace(
        cfg,
        name="ViT-tiny",
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        image_resolution=64,
        embed_dim=32,
        transformer_width=64,
        transformer_heads=2,
        transformer_layers=2,
        vocab_size=128,
        context_length=16,
    )


def test_quant_tower_tree_identical_and_embeddings_close():
    cfg = _tiny_vit_config()
    model = create_clip(cfg)
    model_q = create_clip(cfg, quant="int8")
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    variables_q = init_clip(model_q, jax.random.PRNGKey(0), batch=1)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables_q
    )

    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    emb = model.apply(variables, images, method=model.encode_image)
    emb_q = model_q.apply(variables, images, method=model_q.encode_image)
    e = np.asarray(emb, np.float64)
    eq = np.asarray(emb_q, np.float64)
    cos = (e * eq).sum(-1) / (
        np.linalg.norm(e, axis=-1) * np.linalg.norm(eq, axis=-1)
    )
    assert cos.min() > 0.99, cos


def test_pallas_int8_matmul_matches_xla():
    """The quant_gemm kernel (interpret mode off-TPU) agrees with the XLA
    int8 path to f32 ulps: the integer GEMM is exact either way; only the
    f32 dequant epilogue's fusion differs (measured <= 2 ulp).  Covers
    bias/no-bias, ragged M (row padding), and unaligned K (the ViT-L/14
    patch GEMM's K=588 -> zero-pad to 608)."""
    rng = np.random.default_rng(3)
    for m, k, n, with_bias in ((200, 256, 128, True), (64, 588, 256, False)):
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(n,)), jnp.float32) if with_bias else None
        ref = int8_dense(x, w, b, impl="xla")
        out = int8_dense(x, w, b, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_pallas_quant_tower_matches_xla_quant_tower():
    """quant='int8_pallas' end to end on an MXU-aligned tiny ViT."""
    import dataclasses

    cfg = dataclasses.replace(
        _tiny_vit_config(), vision_width=128, vision_patch_size=8,
        image_resolution=32, embed_dim=128,
    )
    model = create_clip(cfg, quant="int8")
    model_p = create_clip(cfg, quant="int8_pallas")
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    a = np.asarray(model.apply(variables, images, method=model.encode_image),
                   np.float64)
    b = np.asarray(model_p.apply(variables, images, method=model_p.encode_image),
                   np.float64)
    # identical quantization + exact integer GEMMs; the f32 epilogues may
    # differ by ulps, and an ulp can flip a downstream round() on a
    # quantization boundary — the bound is the quant step, like the tp test
    np.testing.assert_allclose(b, a, atol=0.02, rtol=0)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_quant_rejects_resnet_tower():
    with pytest.raises(ValueError, match="ViT-only"):
        init_clip(
            create_clip(get_config("RN50"), quant="int8"), jax.random.PRNGKey(0)
        )


def test_unknown_quant_mode_rejected():
    cfg = _tiny_vit_config()
    with pytest.raises(ValueError, match="unknown quant mode"):
        init_clip(create_clip(cfg, quant="int4"), jax.random.PRNGKey(0))
