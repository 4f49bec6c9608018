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
