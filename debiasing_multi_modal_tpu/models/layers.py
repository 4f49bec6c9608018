"""Shared Flax layers for the CLIP towers.

Numerics policy (TPU): activations may be bf16 (``dtype``), parameters are
fp32 (``param_dtype``), and every normalization computes its statistics in
fp32 — the rebuild's equivalent of the reference's fp16-safe ``LayerNorm``
subclass (clip/model.py:157-163) and fp32 BatchNorm statistics under autocast.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.attention import (
    multi_head_attention,
    multi_head_attention_packed,
)
from debiasing_multi_modal_tpu.ops.quant import Int8Dense

Dtype = Any

QUANT_MODES = ("none", "int8", "int8_pallas")


def quant_impl(quant: str) -> str:
    """Map a model-level quant mode to the int8_dense GEMM impl."""
    return "pallas" if quant == "int8_pallas" else "xla"


def make_dense(features: int, *, dtype, param_dtype, quant: str, name: str):
    """``nn.Dense`` or its W8A8 drop-in (``ops/quant.py``), by ``quant`` mode.

    Parameter trees are identical either way, so converted checkpoints load
    into both.  ``quant`` is validated here so a typo fails at trace time.
    "int8" runs the XLA int8 dot; "int8_pallas" the ops/quant_gemm.py kernel.
    """
    if quant not in QUANT_MODES:
        raise ValueError(f"unknown quant mode {quant!r}; known: {QUANT_MODES}")
    if quant == "none":
        return nn.Dense(features, dtype=dtype, param_dtype=param_dtype, name=name)
    return Int8Dense(
        features, dtype=dtype, param_dtype=param_dtype,
        impl=quant_impl(quant), name=name,
    )


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — reference clip/model.py:166-168."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 and cast back to the input dtype."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig = x.dtype
        out = nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="ln",
        )(x.astype(jnp.float32))
        return out.astype(orig)


class InferenceBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics (fp32).

    The CLIP encoders are frozen feature extractors in this pipeline — the
    reference never trains them (model.eval() at load, clip/model.py:436) — so
    their BatchNorms are pure affine transforms of running stats.  Keeping
    them as an explicit inference-only module lets XLA fold scale/shift into
    the adjacent convolutions.
    """

    features: int
    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        shift = bias.astype(jnp.float32) - mean * inv
        out = x.astype(jnp.float32) * inv + shift
        return out.astype(x.dtype)


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: declares the identical
    {kernel, bias} tree (same names, same initializers) without computing,
    so a fused consumer can concatenate kernels while converted checkpoints
    keep loading at the unfused paths."""

    features: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class MultiHeadAttentionBlock(nn.Module):
    """Self-attention with packed-qkv-style projections over [B, S, D].

    Equivalent to torch ``nn.MultiheadAttention`` used by the reference's
    ``ResidualAttentionBlock`` (clip/model.py:171-192): one fused in-projection
    (here three Dense layers whose kernels concatenate to the torch
    ``in_proj_weight``) and an out-projection.

    ``fuse_qkv=True`` computes the three projections as ONE [D, 3D] GEMM
    (the torch in_proj layout) by concatenating the q/k/v kernels at apply
    time — the parameter tree is unchanged (q_proj/k_proj/v_proj), only the
    GEMM shape differs.  On the MXU a 3x-wider N amortizes the output-tile
    setup of three narrow (e.g. 768-wide) GEMMs; numerics are the same
    contraction per output column (allclose-pinned in test_layers.py).
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, causal: bool = False) -> jax.Array:
        d = x.shape[-1]
        dense = lambda name: make_dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name=name,
        )
        if self.fuse_qkv and self.quant == "none":
            kbs = [
                _DenseParams(d, d, param_dtype=self.param_dtype, name=n)()
                for n in ("q_proj", "k_proj", "v_proj")
            ]
            kernel = jnp.concatenate([kb[0] for kb in kbs], axis=1)
            bias = jnp.concatenate([kb[1] for kb in kbs])
            qkv = (
                jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
                + bias.astype(self.dtype)
            )
            # the packed [B, S, 3D] slab feeds the short kernel directly
            # (static lane offsets); splitting here materialized three
            # [B, S, D] HBM copies and measured -14% full-model
            out = multi_head_attention_packed(
                qkv, self.num_heads, causal=causal, impl=self.attn_impl
            )
        else:
            q, k, v = dense("q_proj")(x), dense("k_proj")(x), dense("v_proj")(x)
            out = multi_head_attention(
                q, k, v, self.num_heads, causal=causal, impl=self.attn_impl
            )
        return dense("out_proj")(out)


class MLPBlock(nn.Module):
    """c_fc -> QuickGELU -> c_proj (reference clip/model.py:177-181)."""

    expansion: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = make_dense(
            d * self.expansion, dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name="c_fc",
        )(x)
        h = quick_gelu(h)
        return make_dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name="c_proj",
        )(h)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (clip/model.py:171-192).

    ``causal`` is a module field (not a call argument) so the block stays
    remat-safe — rematerialization would otherwise trace it into a tracer.
    """

    num_heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + MultiHeadAttentionBlock(
            self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            fuse_qkv=self.fuse_qkv,
            name="attn",
        )(LayerNormF32(param_dtype=self.param_dtype, name="ln_1")(x), causal=self.causal)
        x = x + MLPBlock(
            dtype=self.dtype, param_dtype=self.param_dtype,
            quant=self.quant, name="mlp",
        )(LayerNormF32(param_dtype=self.param_dtype, name="ln_2")(x))
        return x


class Transformer(nn.Module):
    """Stack of residual attention blocks.

    Uses a plain Python loop (depth is static and small, 12-24 layers);
    blocks are individually rematerializable via ``remat`` for pod-scale
    training configurations.
    """

    width: int
    layers: int
    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    quant: str = "none"
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, causal: bool = False) -> jax.Array:
        if x.shape[-1] != self.width:
            # width otherwise goes unread (blocks size off x.shape[-1]);
            # validate so a mismatched config fails here, not silently
            raise ValueError(
                f"input width {x.shape[-1]} != configured width {self.width}"
            )
        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(ResidualAttentionBlock)
        for i in range(self.layers):
            x = block_cls(
                self.heads,
                causal=causal,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.attn_impl,
                quant=self.quant,
                fuse_qkv=self.fuse_qkv,
                name=f"resblocks_{i}",
            )(x)
        return x
