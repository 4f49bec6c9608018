"""Full-scale checkpoint-conversion rehearsal at the EXACT real RN50 and
ViT-B/32 shapes (default), plus ViT-L/14@336px, RN101 and RN50x4 opt-in
(``RUN_XL_PARITY=1``) — the latter pins the width-multiplier RN regime
(width 80, 40-head attnpool over 9*9+1 tokens at 288px).

`test_model_parity.py` pins converter + model numerics on toy configs; this
file de-risks the day-one path for *real* OpenAI checkpoints (unavailable
offline) by building random-valued reference torch models at the true
hyperparameters — RN50: layers (3,4,6,3), width 64, embed 1024, 32-head
attention pool over 7*7+1 tokens; ViT-B/32: 12 layers, width 768, patch 32 —
wrapping their state dicts in a TorchScript archive exactly as OpenAI
distributes them (reference clip/clip.py:120-143 loads via ``torch.jit.load``
and falls back to ``torch.load``), and asserting:

1. the archive round-trips through ``load_openai_checkpoint``,
2. shape sniffing (``config_from_state_dict``) recovers the real architecture
   hyperparameters exactly (reference ``build_model``, clip/model.py:399-436),
   tolerating the archive's extra ``input_resolution``/``context_length``/
   ``vocab_size`` scalar buffers (deleted at clip/model.py:431-433),
3. ``encode_image``/``encode_text`` activation parity vs the reference torch
   model at fp32 (rtol 2e-4, same bar as the toy-config parity tests).
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.models.config import CONFIGS
from debiasing_multi_modal_tpu.weights.convert import (
    config_from_state_dict,
    load_openai_checkpoint,
    variables_from_state_dict,
)

REFERENCE_MODEL = "/root/reference/clip/model.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE_MODEL), reason="reference tree not mounted"
)

# Real architecture hyperparameters, positional order of reference
# CLIP.__init__ (clip/model.py:244-257): embed_dim, image_resolution,
# vision_layers, vision_width, vision_patch_size, context_length, vocab_size,
# transformer_width, transformer_heads, transformer_layers.
REAL_HPARAMS = {
    "RN50": (1024, 224, (3, 4, 6, 3), 64, None, 77, 49408, 512, 8, 12),
    "ViT-B/32": (512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    # pod-scale flagship (BASELINE config 5); opt-in below (~2 min extra)
    "ViT-L/14@336px": (768, 336, 24, 1024, 14, 77, 49408, 768, 12, 12),
    # the other reference-CLI RN backbones (clip_inference.py:280): RN101
    # exercises the deep-layer config at default width; RN50x4 the
    # width-multiplier regime (width 80, 40-head attnpool, 9*9+1 tokens,
    # 288px input) whose attnpool/spacial shapes differ from every
    # default-width model.  Opt-in below (RUN_XL_PARITY=1).
    "RN101": (512, 224, (3, 4, 23, 3), 64, None, 77, 49408, 512, 8, 12),
    "RN50x4": (640, 288, (4, 6, 10, 6), 80, None, 77, 49408, 640, 10, 12),
}


def _load_reference_model_module():
    spec = importlib.util.spec_from_file_location("ref_clip_model", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


from debiasing_multi_modal_tpu.weights.convert import (
    save_jit_state_dict_archive as _save_jit_archive,
)


def _token_batch(n, seq=77, vocab=49408):
    """Real-vocab prompts: SOT 49406, body, EOT 49407 (= max id, so the
    reference's argmax-EOT gather at model.py:354 holds)."""
    rng = np.random.default_rng(0)
    toks = np.zeros((n, seq), np.int64)
    for i in range(n):
        length = int(rng.integers(5, 16))
        toks[i, 0] = vocab - 2
        toks[i, 1 : length - 1] = rng.integers(1, vocab - 2, length - 2)
        toks[i, length - 1] = vocab - 1
    return toks


def test_zoo_wide_config_sniffing():
    """Shape sniffing recovers EVERY zoo architecture from the reference's
    real state-dict structure.  Models are built on torch's meta device
    (shapes without storage — RN50x64's 1.2 GB is instant), so this covers
    all nine public checkpoints (clip/clip.py:30-40) at their true shapes,
    not just the two activation-parity models."""
    import torch

    mod = _load_reference_model_module()
    for name, reg in CONFIGS.items():
        with torch.device("meta"):
            ref = mod.CLIP(
                reg.embed_dim,
                reg.image_resolution,
                reg.vision_layers,
                reg.vision_width,
                reg.vision_patch_size,
                reg.context_length,
                reg.vocab_size,
                reg.transformer_width,
                reg.transformer_heads,
                reg.transformer_layers,
            )
        cfg = config_from_state_dict(ref.state_dict(), name=name)
        assert (
            cfg.embed_dim,
            cfg.image_resolution,
            cfg.vision_layers,
            cfg.vision_width,
            cfg.vision_patch_size,
            cfg.transformer_width,
            cfg.transformer_heads,
            cfg.transformer_layers,
        ) == (
            reg.embed_dim,
            reg.image_resolution,
            reg.vision_layers,
            reg.vision_width,
            reg.vision_patch_size,
            reg.transformer_width,
            reg.transformer_heads,
            reg.transformer_layers,
        ), name


@pytest.mark.parametrize(
    "name",
    [
        "RN50",
        "ViT-B/32",
        pytest.param(
            "ViT-L/14@336px",
            marks=pytest.mark.skipif(
                os.environ.get("RUN_XL_PARITY") != "1",
                reason="428M-param parity rehearsal is opt-in (RUN_XL_PARITY=1)",
            ),
        ),
        pytest.param(
            "RN101",
            marks=pytest.mark.skipif(
                os.environ.get("RUN_XL_PARITY") != "1",
                reason="full RN-family parity rehearsal is opt-in (RUN_XL_PARITY=1)",
            ),
        ),
        pytest.param(
            "RN50x4",
            marks=pytest.mark.skipif(
                os.environ.get("RUN_XL_PARITY") != "1",
                reason="full RN-family parity rehearsal is opt-in (RUN_XL_PARITY=1)",
            ),
        ),
    ],
    ids=["rn50", "vitb32", "vitl14_336", "rn101", "rn50x4"],
)
def test_full_shape_archive_sniff_and_parity(name, tmp_path):
    import torch

    hp = REAL_HPARAMS[name]
    mod = _load_reference_model_module()
    torch.manual_seed(0)
    ref = mod.CLIP(*hp).float().eval()
    direct_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # 1. TorchScript archive round trip, incl. the real archives' extra
    # scalar buffers (reference deletes them at clip/model.py:431-433).
    archive_sd = dict(direct_sd)
    archive_sd["input_resolution"] = np.asarray(float(hp[1]), np.float32)
    archive_sd["context_length"] = np.asarray(float(hp[5]), np.float32)
    archive_sd["vocab_size"] = np.asarray(float(hp[6]), np.float32)
    path = str(tmp_path / f"{name.replace('/', '-')}.pt")
    _save_jit_archive(archive_sd, path)
    sd = load_openai_checkpoint(path)
    assert set(sd) == set(archive_sd)
    for k in direct_sd:
        assert sd[k].shape == direct_sd[k].shape, k
        np.testing.assert_array_equal(sd[k], direct_sd[k])

    # 2. Shape sniffing recovers the real architecture exactly.
    cfg = config_from_state_dict(sd, name=name)
    reg = CONFIGS[name]
    assert (
        cfg.embed_dim,
        cfg.image_resolution,
        cfg.vision_layers,
        cfg.vision_width,
        cfg.vision_patch_size,
        cfg.context_length,
        cfg.vocab_size,
        cfg.transformer_width,
        cfg.transformer_heads,
        cfg.transformer_layers,
    ) == hp
    # ... and matches the registry entry used for from-scratch init/benchmarks
    assert (cfg.vision_layers, cfg.vision_width, cfg.embed_dim) == (
        reg.vision_layers,
        reg.vision_width,
        reg.embed_dim,
    )
    if hp[4] is None:  # ResNet family
        # attnpool heads = vision_width * 32 // 64 (model.py:127); token
        # grid = input_resolution / 32 (stem + 4 stages each halve).
        assert cfg.vision_heads == hp[3] * 32 // 64
        assert cfg.image_seq_len == (hp[1] // 32) ** 2 + 1
    else:
        assert cfg.vision_heads == hp[3] // 64  # ViT heads = width/64
        assert cfg.image_seq_len == (hp[1] // hp[4]) ** 2 + 1

    # 3. Activation parity at the real shapes, fp32.
    variables = variables_from_state_dict(sd, cfg)
    model = create_clip(cfg)

    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, hp[1], hp[1], 3), dtype=np.float32)
    toks = _token_batch(2)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()

    img = np.asarray(model.apply(variables, jnp.asarray(imgs), method=model.encode_image))
    txt = np.asarray(
        model.apply(variables, jnp.asarray(toks, jnp.int32), method=model.encode_text)
    )
    np.testing.assert_allclose(img, ref_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(txt, ref_txt, rtol=2e-4, atol=2e-4)

    # 4. (ViT) the opt-in W8A8 mode at REAL shapes: the same converted
    # variables load into the quantized model unchanged, and its embeddings
    # stay within the W8A8 band of the torch reference — the tiny-config
    # cosine bound of test_quant.py re-pinned at production width.
    if cfg.is_vit:
        model_q = create_clip(cfg, quant="int8")
        img_q = np.asarray(
            model_q.apply(variables, jnp.asarray(imgs), method=model_q.encode_image),
            np.float64,
        )
        r = ref_img.astype(np.float64)
        cos = (img_q * r).sum(-1) / (
            np.linalg.norm(img_q, axis=-1) * np.linalg.norm(r, axis=-1)
        )
        assert cos.min() > 0.99, cos
