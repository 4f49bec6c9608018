"""``scratch_init="reference"`` — parity with CLIP.initialize_parameters
(reference clip/model.py:306-334).

The reference draws specific tensors from N(0, std) with closed-form stds;
torch's ``nn.init.normal_`` and our ``jax.random.normal`` sample the same
distribution, so per-tensor moment bands against the closed forms are the
statistical parity evidence (closes PARITY deviation 12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig


def _tiny_rn_config():
    return CLIPConfig(
        name="tiny-rn", embed_dim=64, image_resolution=64,
        vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )


def _tiny_vit_config():
    return CLIPConfig(
        name="tiny-vit", embed_dim=64, image_resolution=64,
        vision_layers=2, vision_width=64, vision_patch_size=16,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )


def _std(a):
    return float(jnp.std(a.astype(jnp.float32)))


def test_reference_scratch_init_stds_match_closed_forms():
    model = create_clip(_tiny_rn_config())
    v = init_clip(model, jax.random.PRNGKey(0), scratch_init="reference")
    p = v["params"]
    text = p["text"]
    width = 64
    layers = 2
    attn_std = width ** -0.5
    proj_std = width ** -0.5 * (2 * layers) ** -0.5
    fc_std = (2 * width) ** -0.5

    # token embedding N(0, 0.02) (clip/model.py:307); 49408*64 samples ->
    # the sample std is tight
    assert abs(_std(text["token_embedding"]["embedding"]) - 0.02) < 0.02 * 0.05
    # text positional embedding N(0, 0.01) (:308); only 77*64 samples
    assert abs(_std(text["positional_embedding"]) - 0.01) < 0.01 * 0.10

    for name in ("resblocks_0", "resblocks_1"):
        blk = text["transformer"][name]
        for proj, std in (
            ("q_proj", attn_std), ("k_proj", attn_std), ("v_proj", attn_std),
            ("out_proj", proj_std),
        ):
            got = _std(blk["attn"][proj]["kernel"])
            assert abs(got - std) < std * 0.10, (name, proj, got, std)
        assert abs(_std(blk["mlp"]["c_fc"]["kernel"]) - fc_std) < fc_std * 0.10
        assert abs(_std(blk["mlp"]["c_proj"]["kernel"]) - proj_std) < proj_std * 0.10

    assert abs(_std(text["text_projection"]) - attn_std) < attn_std * 0.10

    # attnpool projections N(0, c_proj.in_features^-0.5) (:305-311)
    pool = p["visual"]["attnpool"]
    pool_std = pool["c_proj"]["kernel"].shape[0] ** -0.5
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        got = _std(pool[proj]["kernel"])
        assert abs(got - pool_std) < pool_std * 0.10, (proj, got, pool_std)

    # bn3 scales zeroed in every Bottleneck (:313-317): residual branches
    # start as identity
    zeroed = 0
    for name, sub in p["visual"].items():
        if name.startswith("layer") and "bn3" in sub:
            assert float(jnp.abs(sub["bn3"]["scale"]).max()) == 0.0, name
            zeroed += 1
    assert zeroed == 4


def test_reference_scratch_init_leaves_other_tensors_untouched():
    """Tensors outside initialize_parameters' scope (convs, biases, BN
    scales other than bn3, LayerNorms) keep the flax init bit-for-bit."""
    model = create_clip(_tiny_rn_config())
    base = init_clip(model, jax.random.PRNGKey(0))
    ref = init_clip(model, jax.random.PRNGKey(0), scratch_init="reference")
    for path in (
        ("visual", "conv1", "kernel"),
        ("visual", "bn1", "scale"),
        ("visual", "layer1_0", "conv1", "kernel"),
        ("text", "ln_final", "ln", "scale"),
    ):
        a, b = base["params"], ref["params"]
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
    # batch_stats untouched
    assert jax.tree_util.tree_structure(base["batch_stats"]) == (
        jax.tree_util.tree_structure(ref["batch_stats"])
    )


def test_reference_scratch_init_vit_tower():
    """ViT towers: initialize_parameters loops over the TEXT transformer
    only; the visual class/pos/proj tensors are already width^-0.5 draws in
    both implementations (model.py:212-216), so only text-side tensors may
    change and the visual tree must be bit-identical."""
    model = create_clip(_tiny_vit_config())
    base = init_clip(model, jax.random.PRNGKey(0))
    ref = init_clip(model, jax.random.PRNGKey(0), scratch_init="reference")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        base["params"]["visual"],
        ref["params"]["visual"],
    )
    # and the text side did change
    assert not np.array_equal(
        np.asarray(base["params"]["text"]["text_projection"]),
        np.asarray(ref["params"]["text"]["text_projection"]),
    )


def test_unknown_scratch_init_rejected():
    model = create_clip(_tiny_vit_config())
    with pytest.raises(ValueError, match="scratch_init"):
        init_clip(model, jax.random.PRNGKey(0), scratch_init="torch")
