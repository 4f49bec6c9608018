"""Text transformer tower (Flax).

Parity surface: reference ``clip/model.py`` ``encode_text`` (:343-356) and the
causal attention mask (:328-334): token embedding + learned positional
embedding, causally-masked transformer, final LayerNorm, and feature gather at
the EOT token — located via ``argmax`` over token ids, valid because EOT is
the highest id in every sequence (a classic silent-wrongness spot; asserted in
tests).  The gathered feature is projected by ``text_projection``.

TPU-first: the causal mask is generated inside the attention kernel (no
materialized 77x77 buffer), batch-major layout, one-hot matmul gather for the
EOT feature (MXU-friendly, avoids dynamic-slice per row).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models.layers import LayerNormF32, Transformer

Dtype = Any


class TextTransformer(nn.Module):
    vocab_size: int
    context_length: int
    width: int
    heads: int
    layers: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        """token_ids: int32 [N, context_length] -> [N, embed_dim]."""
        emb = nn.Embed(
            self.vocab_size,
            self.width,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="token_embedding",
        )(token_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            self.param_dtype,
        )
        x = emb + pos.astype(emb.dtype)

        x = Transformer(
            self.width,
            self.layers,
            self.heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            fuse_qkv=self.fuse_qkv,
            name="transformer",
        )(x, causal=True)

        x = LayerNormF32(param_dtype=self.param_dtype, name="ln_final")(x)

        # EOT gather: argmax over ids == position of <|endoftext|> (49407).
        eot_pos = jnp.argmax(token_ids, axis=-1)
        onehot = jax.nn.one_hot(eot_pos, self.context_length, dtype=x.dtype)
        feats = jnp.einsum("ns,nsd->nd", onehot, x)

        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.embed_dim),
            self.param_dtype,
        )
        return feats @ proj.astype(feats.dtype)
