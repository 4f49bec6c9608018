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
    # one [D, 3D] in-projection GEMM per attention (kernels concatenated at
    # apply time; the param tree keeps q_proj/k_proj/v_proj) — the torch
    # in_proj layout.  Measured policy in docs/DESIGN.md §8.8.
    fuse_qkv: bool = False

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
                fuse_qkv=self.fuse_qkv,
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
            fuse_qkv=self.fuse_qkv,
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
    fuse_qkv: bool = False,
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
        config=cfg, attn_impl=attn_impl, remat=remat, fuse_bn=fuse_bn,
        quant=quant, fuse_qkv=fuse_qkv,
    )


def init_clip(
    model: CLIP,
    rng: jax.Array,
    batch: int = 1,
    image_resolution: Optional[int] = None,
    scratch_init: str = "flax",
):
    """Initialize parameter/batch-stats collections with dummy inputs.

    Initialization is jitted as ONE program: un-jitted flax init dispatches
    hundreds of tiny ops, which is pathological on remote-TPU links where
    every program carries ~10s of fixed compile latency.

    ``scratch_init="reference"`` re-draws the tensors the reference's
    ``CLIP.initialize_parameters`` explicitly initializes with its stds
    (:func:`reference_scratch_init`); the default keeps flax initializers.
    Real runs load converted OpenAI weights either way — this mode exists so
    scratch training starts from the reference's distribution.
    """
    cfg = model.config
    res = image_resolution or cfg.image_resolution
    images = jnp.zeros((batch, res, res, 3), cfg.dtype)
    tokens = jnp.zeros((batch, cfg.context_length), jnp.int32)
    variables = jax.jit(model.init)(rng, images, tokens)
    if scratch_init == "reference":
        ref_rng = jax.random.fold_in(rng, 1)
        variables = jax.jit(reference_scratch_init)(variables, ref_rng)
    elif scratch_init != "flax":
        raise ValueError(f"unknown scratch_init {scratch_init!r}")
    return variables


def reference_scratch_init(variables, rng: jax.Array):
    """Apply the reference's ``CLIP.initialize_parameters`` scheme
    (clip/model.py:306-334) to a freshly initialized variables tree:

    - token embedding ~ N(0, 0.02), text positional embedding ~ N(0, 0.01);
    - ResNet attnpool q/k/v/c projections ~ N(0, in_features(c_proj)^-0.5)
      and every Bottleneck's bn3 scale zeroed (residual branches start as
      identity — clip/model.py:311-318);
    - TEXT transformer blocks: attn in-projections ~ N(0, width^-0.5),
      attn out / mlp c_proj ~ N(0, width^-0.5 * (2*layers)^-0.5), mlp c_fc
      ~ N(0, (2*width)^-0.5); text projection ~ N(0, width^-0.5)
      (:322-331).  The reference loops over ``self.transformer`` only — the
      ViT tower's blocks keep library defaults there too, and its
      class/positional/proj tensors are already drawn at width^-0.5 by both
      implementations (model.py:212-216 / models/vit.py), so ViT towers need
      no extra treatment.

    Tensors the reference leaves to torch defaults (convs, biases, BN
    scales other than bn3, LayerNorms) keep this framework's flax defaults:
    neither library's default is part of the reference's own init scheme.

    Returns a new variables tree; jit-safe (pure function of inputs).
    """
    params = jax.tree.map(lambda x: x, variables)["params"]  # fresh containers

    def normal_like(key, a, std):
        return (std * jax.random.normal(key, a.shape, jnp.float32)).astype(a.dtype)

    # deterministic per-tensor keys via fold_in on a running counter
    counter = [0]

    def next_key():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    text = params["text"]
    text["token_embedding"] = dict(text["token_embedding"])
    text["token_embedding"]["embedding"] = normal_like(
        next_key(), text["token_embedding"]["embedding"], 0.02
    )
    text["positional_embedding"] = normal_like(
        next_key(), text["positional_embedding"], 0.01
    )
    width = text["positional_embedding"].shape[1]
    blocks = [k for k in text["transformer"] if k.startswith("resblocks_")]
    proj_std = width ** -0.5 * (2 * len(blocks)) ** -0.5
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    for name in blocks:
        blk = text["transformer"][name]
        for proj, std in (
            ("q_proj", attn_std), ("k_proj", attn_std), ("v_proj", attn_std),
            ("out_proj", proj_std),
        ):
            blk["attn"][proj]["kernel"] = normal_like(
                next_key(), blk["attn"][proj]["kernel"], std
            )
        blk["mlp"]["c_fc"]["kernel"] = normal_like(
            next_key(), blk["mlp"]["c_fc"]["kernel"], fc_std
        )
        blk["mlp"]["c_proj"]["kernel"] = normal_like(
            next_key(), blk["mlp"]["c_proj"]["kernel"], proj_std
        )
    text["text_projection"] = normal_like(
        next_key(), text["text_projection"], width ** -0.5
    )

    visual = params["visual"]
    if "attnpool" in visual:  # ModifiedResNet tower
        pool = visual["attnpool"]
        std = pool["c_proj"]["kernel"].shape[0] ** -0.5  # c_proj.in_features
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            pool[proj]["kernel"] = normal_like(
                next_key(), pool[proj]["kernel"], std
            )
        for name, sub in visual.items():
            if name.startswith("layer") and "bn3" in sub:
                sub["bn3"] = dict(sub["bn3"])
                sub["bn3"]["scale"] = jnp.zeros_like(sub["bn3"]["scale"])

    out = dict(variables)
    out["params"] = params
    return out
