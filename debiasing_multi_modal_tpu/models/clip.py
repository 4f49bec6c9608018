"""The combined CLIP model (Flax).

Parity surface: reference ``clip/model.py`` ``CLIP`` (:243-372):
``encode_image`` / ``encode_text`` towers and the contrastive ``__call__``
producing temperature-scaled cosine-similarity logits (:358-372).

The embedding-space matmuls (normalization + logits) always run in float32
with HIGHEST matmul precision — this is the accuracy-critical head
(SURVEY.md §7 hard part 1) even when the towers compute in bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models.config import CLIPConfig, get_config
from debiasing_multi_modal_tpu.models.resnet import ModifiedResNet
from debiasing_multi_modal_tpu.models.text import TextTransformer
from debiasing_multi_modal_tpu.models.vit import VisionTransformer


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """x / ||x|| along ``axis`` in float32 (norm semantics of torch .norm)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x32 / norm).astype(x.dtype)


class CLIP(nn.Module):
    config: CLIPConfig
    attn_impl: str = "auto"
    remat: bool = False
    fuse_bn: bool = False  # folded-BN inference variant (weights/fold.py)
    # "int8": dynamic W8A8 Dense GEMMs in the VISION tower (ops/quant.py).
    # ViT-only: int8 convs measured null on this XLA build (DESIGN §8), and
    # the text tower encodes <=8 prompts total — nothing to win there.
    quant: str = "none"

    def setup(self):
        cfg = self.config
        if cfg.is_vit:
            self.visual = VisionTransformer(
                patch_size=cfg.vision_patch_size,
                width=cfg.vision_width,
                layers=cfg.vision_layers,
                heads=cfg.vision_heads,
                output_dim=cfg.embed_dim,
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                attn_impl=self.attn_impl,
                remat=self.remat,
                quant=self.quant,
            )
        else:
            if self.quant != "none":
                raise ValueError(
                    "quant is ViT-only: the ResNet towers are conv-dominated "
                    "and int8 convs measured 0.9-1.0x on this XLA build "
                    "(docs/DESIGN.md §8)"
                )
            self.visual = ModifiedResNet(
                layers=cfg.vision_layers,
                output_dim=cfg.embed_dim,
                heads=cfg.vision_heads,
                width=cfg.vision_width,
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                fuse_bn=self.fuse_bn,
            )
        self.text = TextTransformer(
            vocab_size=cfg.vocab_size,
            context_length=cfg.context_length,
            width=cfg.transformer_width,
            heads=cfg.transformer_heads,
            layers=cfg.transformer_layers,
            embed_dim=cfg.embed_dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1.0 / 0.07)),
            (),
        )

    def encode_image(self, images: jax.Array) -> jax.Array:
        """[N, H, W, 3] CLIP-normalized floats -> un-normalized [N, D]."""
        return self.visual(images)

    def encode_text(self, token_ids: jax.Array) -> jax.Array:
        """int32 [N, 77] -> un-normalized [N, D]."""
        return self.text(token_ids)

    def __call__(
        self, images: jax.Array, token_ids: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        # upcast BEFORE normalizing: l2_normalize returns x.dtype, so
        # normalize-then-upcast would round the normalized components to
        # bf16 ahead of the HIGHEST-precision matmul (the fp32-head policy;
        # extract/runner.py orders it the same way)
        img = l2_normalize(self.encode_image(images).astype(jnp.float32))
        txt = l2_normalize(self.encode_text(token_ids).astype(jnp.float32))
        scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        logits_per_image = scale * jnp.matmul(
            img, txt.T, precision=jax.lax.Precision.HIGHEST
        )
        return logits_per_image, logits_per_image.T


def create_clip(
    name_or_config,
    dtype=None,
    attn_impl: str = "auto",
    remat: bool = False,
    fuse_bn: bool = False,
    quant: str = "none",
) -> CLIP:
    """``dtype=None`` keeps the config's dtype (fp32 for zoo names); an
    explicit dtype is honored for BOTH name and CLIPConfig inputs — the old
    signature silently ignored it for configs, running fp32 convs when the
    caller asked for bf16."""
    if isinstance(name_or_config, CLIPConfig):
        cfg = name_or_config
        if dtype is not None:
            cfg = cfg.with_dtype(dtype)
    else:
        cfg = get_config(
            name_or_config, dtype=jnp.float32 if dtype is None else dtype
        )
    return CLIP(
        config=cfg, attn_impl=attn_impl, remat=remat, fuse_bn=fuse_bn, quant=quant
    )


def init_clip(
    model: CLIP,
    rng: jax.Array,
    batch: int = 1,
    image_resolution: Optional[int] = None,
):
    """Initialize parameter/batch-stats collections with dummy inputs.

    Initialization is jitted as ONE program: un-jitted flax init dispatches
    hundreds of tiny ops, which is pathological on remote-TPU links where
    every program carries ~10s of fixed compile latency.
    """
    cfg = model.config
    res = image_resolution or cfg.image_resolution
    images = jnp.zeros((batch, res, res, 3), cfg.dtype)
    tokens = jnp.zeros((batch, cfg.context_length), jnp.int32)
    return jax.jit(model.init)(rng, images, tokens)
