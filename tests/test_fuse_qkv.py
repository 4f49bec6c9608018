"""fuse_qkv: the single [D, 3D] attention in-projection GEMM.

``fuse_qkv=True`` concatenates the q/k/v kernels at apply time into the
torch ``in_proj_weight`` layout (reference clip/model.py:171-192 via
``nn.MultiheadAttention``) so each attention pays ONE wide GEMM instead of
three narrow ones.  The contract: the parameter tree is IDENTICAL to the
unfused module (q_proj/k_proj/v_proj survive, converted checkpoints load
unchanged) and the outputs match the unfused path to float tolerance (the
per-output-column contraction is the same; only GEMM tiling differs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig


def _tiny_vit_cfg():
    return CLIPConfig(
        name="tiny-vit",
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
        vocab_size=128,
    )


def test_param_tree_identical():
    cfg = _tiny_vit_cfg()
    plain = create_clip(cfg)
    fused = create_clip(cfg, fuse_qkv=True)
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32)
    sp = jax.eval_shape(plain.init, jax.random.PRNGKey(0), imgs, toks)
    sf = jax.eval_shape(fused.init, jax.random.PRNGKey(0), imgs, toks)
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), sp)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), sf)
    assert tp == tf


def test_outputs_match_unfused_both_towers():
    cfg = _tiny_vit_cfg()
    plain = create_clip(cfg)
    fused = create_clip(cfg, fuse_qkv=True)
    variables = init_clip(plain, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    toks = np.zeros((3, 77), np.int64)
    for i in range(3):
        ln = int(rng.integers(4, 20))
        toks[i, 0] = 126
        toks[i, 1 : ln - 1] = rng.integers(1, 125, ln - 2)
        toks[i, ln - 1] = 127
    toks = jnp.asarray(toks)
    # the SAME variables drive both modules — that is the checkpoint contract
    ip = plain.apply(variables, imgs, method=plain.encode_image)
    i_f = fused.apply(variables, imgs, method=fused.encode_image)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(i_f), rtol=1e-5,
                               atol=1e-5)
    tp_ = plain.apply(variables, toks, method=plain.encode_text)
    tf_ = fused.apply(variables, toks, method=fused.encode_text)
    np.testing.assert_allclose(np.asarray(tp_), np.asarray(tf_), rtol=1e-5,
                               atol=1e-5)


def test_packed_kernel_matches_xla_oracle():
    """short_attention_packed on the lane-packed [B, S, 3D] slab == the
    merged XLA oracle on the split q/k/v (causal and not, f32 and bf16)."""
    from debiasing_multi_modal_tpu.ops.short_attention import (
        _xla_merged,
        short_attention_packed,
        supported_packed,
    )

    rng = np.random.default_rng(7)
    for dtype, tol in ((np.float32, 2e-6), (jnp.bfloat16, 3e-2)):
        qkv = jnp.asarray(
            rng.standard_normal((4, 18, 3 * 256)).astype(np.float32), dtype
        )
        assert supported_packed(qkv, 4)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        for causal in (False, True):
            out = short_attention_packed(qkv, 4, causal=causal)
            ref = _xla_merged(q, k, v, 4, causal)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=tol,
            )


def test_packed_kernel_gradient_matches_split():
    from debiasing_multi_modal_tpu.ops.short_attention import (
        short_attention,
        short_attention_packed,
    )

    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.standard_normal((2, 10, 3 * 128)).astype(np.float32))

    def loss_packed(p):
        return jnp.sum(short_attention_packed(p, 2, causal=True) ** 2)

    def loss_split(p):
        q, k, v = jnp.split(p, 3, axis=-1)
        return jnp.sum(short_attention(q, k, v, 2, causal=True) ** 2)

    gp = jax.grad(loss_packed)(qkv)
    gs = jax.grad(loss_split)(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), rtol=1e-5,
                               atol=1e-6)


def test_packed_dispatch_falls_back_when_unsupported():
    """multi_head_attention_packed must split + follow the normal dispatch
    when the packed kernel can't take the shape (here: D not lane-aligned)."""
    from debiasing_multi_modal_tpu.ops.attention import (
        multi_head_attention,
        multi_head_attention_packed,
    )
    from debiasing_multi_modal_tpu.ops.short_attention import supported_packed

    rng = np.random.default_rng(9)
    qkv = jnp.asarray(rng.standard_normal((2, 9, 3 * 96)).astype(np.float32))
    assert not supported_packed(qkv, 3)
    out = multi_head_attention_packed(qkv, 3, causal=True, impl="auto")
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = multi_head_attention(q, k, v, 3, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_fused_short_path_matches_unfused_short():
    """The full module with fuse_qkv=True + impl='short' (packed kernel,
    interpret mode on CPU) == fuse_qkv=False + impl='short' — the in-model
    contract for the production TPU configuration."""
    # the short kernel needs lane-aligned D (128-multiple), unlike the
    # tiny 64-wide parity config above
    cfg = CLIPConfig(
        name="tiny-vit-128",
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
        vocab_size=128,
    )
    plain = create_clip(cfg, attn_impl="short")
    fused = create_clip(cfg, attn_impl="short", fuse_qkv=True)
    variables = init_clip(plain, jax.random.PRNGKey(3))
    rng = np.random.default_rng(10)
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    ip = plain.apply(variables, imgs, method=plain.encode_image)
    i_f = fused.apply(variables, imgs, method=fused.encode_image)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(i_f), rtol=1e-5,
                               atol=1e-5)


def test_fuse_qkv_quant_falls_back_to_unfused():
    # the int8 path quantizes per-Dense; fuse_qkv must not silently change
    # its numerics — the fused branch is gated to quant == "none"
    cfg = _tiny_vit_cfg()
    q_plain = create_clip(cfg, quant="int8")
    q_fused = create_clip(cfg, quant="int8", fuse_qkv=True)
    variables = init_clip(q_plain, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    a = q_plain.apply(variables, imgs, method=q_plain.encode_image)
    b = q_fused.apply(variables, imgs, method=q_fused.encode_image)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
