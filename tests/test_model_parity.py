"""Numerics parity: Flax CLIP towers vs. the reference PyTorch implementation
with identical (converted) weights — fp32, CPU, small configs.

This is the strongest correctness check available without network access to
the OpenAI checkpoints: it validates both the model semantics (anti-aliased
bottlenecks, single-query attention pool, EOT gather, QuickGELU, causal mask)
and the weight converter's tensor remapping in one shot.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.weights.convert import (
    config_from_state_dict,
    variables_from_state_dict,
)

REFERENCE_MODEL = "/root/reference/clip/model.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE_MODEL), reason="reference tree not mounted"
)


def _load_reference_model_module():
    spec = importlib.util.spec_from_file_location("ref_clip_model", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_reference(vision_layers, vision_width, resolution, patch):
    import torch

    torch.manual_seed(0)
    mod = _load_reference_model_module()
    model = mod.CLIP(
        embed_dim=64,
        image_resolution=resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=77,
        vocab_size=512,
        transformer_width=128,  # heads = width // 64 must hold for shape sniffing
        transformer_heads=2,
        transformer_layers=2,
    )
    model = model.float().eval()
    return model


def _token_batch(n, vocab=512, seq=77):
    rng = np.random.default_rng(0)
    toks = np.zeros((n, seq), np.int64)
    for i in range(n):
        length = int(rng.integers(3, 10))
        toks[i, 0] = vocab - 2  # "sot"
        toks[i, 1 : length - 1] = rng.integers(1, vocab - 2, length - 2)
        toks[i, length - 1] = vocab - 1  # "eot" == max id in the sequence
    return toks


@pytest.mark.parametrize(
    "vision_layers,width,res,patch",
    [
        ((1, 1, 1, 1), 8, 64, None),  # ModifiedResNet path
        (2, 64, 64, 16),  # ViT path
    ],
    ids=["resnet", "vit"],
)
def test_clip_matches_reference(vision_layers, width, res, patch):
    import torch

    ref = _make_reference(vision_layers, width, res, patch)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = config_from_state_dict(sd)
    assert cfg.vision_layers == vision_layers
    assert cfg.image_resolution == res
    assert cfg.vocab_size == 512 and cfg.transformer_layers == 2

    variables = variables_from_state_dict(sd, cfg)
    model = create_clip(cfg)

    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((3, res, res, 3), dtype=np.float32)
    toks = _token_batch(3)

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()
        ref_li, _ = ref(torch.from_numpy(imgs.transpose(0, 3, 1, 2)), torch.from_numpy(toks))
        ref_li = ref_li.numpy()

    img = np.asarray(
        model.apply(variables, jnp.asarray(imgs), method=model.encode_image)
    )
    txt = np.asarray(
        model.apply(variables, jnp.asarray(toks, jnp.int32), method=model.encode_text)
    )
    li, lt = model.apply(variables, jnp.asarray(imgs), jnp.asarray(toks, jnp.int32))

    np.testing.assert_allclose(img, ref_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(txt, ref_txt, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(li), ref_li, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lt), ref_li.T, rtol=2e-3, atol=2e-3)


def test_bf16_policy_close_to_fp32():
    """bf16 compute with fp32 norms should track fp32 within bf16 tolerance."""
    cfg32 = CLIPConfig(
        name="t",
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        transformer_width=64,
        transformer_heads=2,
        transformer_layers=2,
    )
    model32 = create_clip(cfg32)
    variables = model32.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 77), jnp.int32),
    )
    model16 = create_clip(cfg32.with_dtype(jnp.bfloat16))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out32 = model32.apply(variables, imgs, method=model32.encode_image)
    out16 = model16.apply(variables, imgs, method=model16.encode_image)
    # cosine similarity of embeddings must survive the dtype change
    a = np.asarray(out32, np.float32)
    b = np.asarray(out16, np.float32)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.999).all()
