"""Vision Transformer tower (Flax).

Parity surface: reference ``clip/model.py`` ``VisionTransformer`` (:206-240):
patch-conv embed (no bias), class token + learned positional embedding, pre-
and post-LayerNorm, output projection from the class token.

TPU-first: the patch conv is expressed as a reshape + matmul (one big MXU GEMM
rather than a strided convolution), batch-major [N, S, D] layout throughout
(no NLD->LND permutes), fused attention blocks.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models.layers import (
    LayerNormF32,
    Transformer,
    quant_impl,
)
from debiasing_multi_modal_tpu.ops.quant import int8_dense

Dtype = Any


class VisionTransformer(nn.Module):
    """``quant="int8"`` runs every transformer Dense on the dynamic W8A8 path
    (ops/quant.py).  Two GEMMs deliberately stay in the activation dtype:

    - the class-token output projection — the embedding-space head
      (accuracy-critical, negligible FLOPs);
    - the patch-embedding GEMM — its row-max quantization reduction breaks
      XLA's patchify-transpose->GEMM layout fusion, forcing the transposed
      [N, gh, p, gw, p, C] tensor to materialize in a pathologically padded
      tiled layout (measured: 20.9x expansion, 18 GB HBM at bs 1024 on
      ViT-B/32 — OOM; docs/DESIGN.md §8.7), and it is a small share of the
      tower's FLOPs (~2% on ViT-B/32)."""

    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: str = "none"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [N, H, W, 3] float (already CLIP-normalized) -> [N, output_dim]."""
        n, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.astype(self.dtype)

        # Patchify as a single GEMM: [N, gh, p, gw, p, C] -> [N, gh*gw, p*p*C].
        patches = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, gh * gw, p * p * c)
        # Kernel laid out to match a (p, p, C, width) conv kernel flattened in
        # (row, col, chan) order — the converter reshapes the torch conv1
        # weight into exactly this matrix.
        kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (p * p * c, self.width),
            self.param_dtype,
        )
        tokens = patches @ kernel.astype(self.dtype)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width,),
            self.param_dtype,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, self.width)), tokens],
            axis=1,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (gh * gw + 1, self.width),
            self.param_dtype,
        )
        tokens = tokens + pos.astype(self.dtype)

        tokens = LayerNormF32(param_dtype=self.param_dtype, name="ln_pre")(tokens)
        tokens = Transformer(
            self.width,
            self.layers,
            self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            quant=self.quant,
            fuse_qkv=self.fuse_qkv,
            name="transformer",
        )(tokens)

        cls_out = LayerNormF32(param_dtype=self.param_dtype, name="ln_post")(
            tokens[:, 0]
        )
        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.output_dim),
            self.param_dtype,
        )
        return cls_out @ proj.astype(cls_out.dtype)
