"""BN-folding inference transform: numerical equivalence with the unfused
ResNet tower under realistic statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.weights.fold import fold_resnet_bn

CFG = CLIPConfig(
    name="fold-rn",
    embed_dim=64,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_patch_size=None,
    transformer_width=64,
    transformer_heads=1,
    transformer_layers=1,
)


def _realistic_stats(variables, rng):
    """Non-trivial but well-conditioned BN statistics."""

    def stat(a, key):
        if key == "mean":
            return jnp.asarray(rng.standard_normal(a.shape).astype(np.float32) * 0.2)
        return jnp.asarray(rng.uniform(0.5, 2.0, a.shape).astype(np.float32))

    stats = variables["batch_stats"]
    new = jax.tree_util.tree_map_with_path(
        lambda path, a: stat(a, path[-1].key), stats
    )
    out = dict(variables)
    out["batch_stats"] = new
    return out


def test_folded_resnet_matches_unfused(rng):
    model = create_clip(CFG)
    variables = _realistic_stats(init_clip(model, jax.random.PRNGKey(0)), rng)
    imgs = jnp.asarray(rng.standard_normal((3, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(model.apply(variables, imgs, method=model.encode_image))

    fused = create_clip(CFG, fuse_bn=True)
    folded = fold_resnet_bn(variables)
    assert "batch_stats" not in folded  # visual stats disappear entirely
    got = np.asarray(fused.apply(folded, imgs, method=fused.encode_image))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # text tower still runs on the folded tree (untouched params)
    toks = jnp.zeros((2, 77), jnp.int32)
    txt = fused.apply(folded, toks, method=fused.encode_text)
    assert txt.shape == (2, 64)


def test_fold_rejects_vit():
    vit = CLIPConfig(
        name="v", embed_dim=32, image_resolution=32, vision_layers=1,
        vision_width=64, vision_patch_size=16, transformer_width=64,
        transformer_heads=1, transformer_layers=1,
    )
    model = create_clip(vit)
    variables = init_clip(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="fold"):
        fold_resnet_bn(variables)
