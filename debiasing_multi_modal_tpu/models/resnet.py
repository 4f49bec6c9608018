"""ModifiedResNet vision tower (Flax, NHWC).

Parity surface: reference ``clip/model.py`` — ``Bottleneck`` (:10-55,
anti-aliased stride: AvgPool before the stride-1 conv3 and in the downsample
path), 3-conv ``stem`` (:107-117), four stages (:121-124), and the
``AttentionPool2d`` head (:58-91): learned (HW+1, C) positional embedding, the
mean token prepended as the single query, separate q/k/v projections and a
``c_proj`` out-projection to ``output_dim``.

TPU-first choices: NHWC layout (native for TPU convolutions), bf16 conv
compute with fp32 BatchNorm statistics folded as affine transforms
(InferenceBatchNorm — the tower is a frozen feature extractor), and the shared
fused attention primitive for the pooling head.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models.layers import InferenceBatchNorm
from debiasing_multi_modal_tpu.ops.attention import dot_product_attention

Dtype = Any


def _avg_pool(x: jax.Array, window: int) -> jax.Array:
    """Non-overlapping average pool (NHWC), the anti-aliasing downsampler."""
    return nn.avg_pool(x, (window, window), strides=(window, window))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    fuse_bn: bool = False

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        conv = lambda feat, kern, name: nn.Conv(  # noqa: E731
            feat,
            (kern, kern),
            padding="SAME" if kern > 1 else "VALID",
            use_bias=self.fuse_bn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        if self.fuse_bn:
            bn = lambda feat, name: (lambda h: h)  # noqa: E731
        else:
            bn = lambda feat, name: InferenceBatchNorm(  # noqa: E731
                feat, param_dtype=self.param_dtype, name=name
            )

        out = nn.relu(bn(self.planes, "bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn(self.planes, "bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn(out_planes, "bn3")(conv(out_planes, 1, "conv3")(out))

        if self.stride > 1 or inplanes != out_planes:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = bn(out_planes, "downsample_bn")(
                conv(out_planes, 1, "downsample_conv")(identity)
            )
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Single-query attention pooling over the final feature map."""

    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [N, HW+1, C]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c ** -0.5),
            (h * w + 1, c),
            self.param_dtype,
        )
        tokens = tokens + pos.astype(tokens.dtype)

        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        # Query is the mean token only — a [N, 1, C] single-query attention,
        # not a full SxS attention (reference model.py:72-74).
        q = dense(self.embed_dim, "q_proj")(tokens[:, :1])
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)
        hd = self.embed_dim // self.num_heads
        out = dot_product_attention(
            q.reshape(n, 1, self.num_heads, hd),
            k.reshape(n, -1, self.num_heads, hd),
            v.reshape(n, -1, self.num_heads, hd),
            impl="xla",  # single-query: MXU-trivial, XLA fuses best
        ).reshape(n, 1, self.embed_dim)
        return dense(self.output_dim, "c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """``fuse_bn=True`` runs the deployment-grade inference variant: frozen
    BatchNorms are folded into the adjacent convolutions (scaled kernels +
    bias) at weight-conversion time (weights/fold.py), eliminating the
    normalization ops entirely."""

    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    width: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [N, H, W, 3] float (already CLIP-normalized) -> [N, output_dim]."""
        x = x.astype(self.dtype)
        conv = lambda feat, kern, stride, name: nn.Conv(  # noqa: E731
            feat,
            (kern, kern),
            strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            use_bias=self.fuse_bn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        if self.fuse_bn:
            bn = lambda feat, name: (lambda h: h)  # noqa: E731
        else:
            bn = lambda feat, name: InferenceBatchNorm(  # noqa: E731
                feat, param_dtype=self.param_dtype, name=name
            )

        # 3-conv stem with avgpool (reference model.py:107-117, 139-144)
        x = nn.relu(bn(self.width // 2, "bn1")(conv(self.width // 2, 3, 2, "conv1")(x)))
        x = nn.relu(bn(self.width // 2, "bn2")(conv(self.width // 2, 3, 1, "conv2")(x)))
        x = nn.relu(bn(self.width, "bn3")(conv(self.width, 3, 1, "conv3")(x)))
        x = _avg_pool(x, 2)

        for stage, (planes_mult, blocks) in enumerate(
            zip((1, 2, 4, 8), self.layers), start=1
        ):
            planes = self.width * planes_mult
            for block in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=2 if (block == 0 and stage > 1) else 1,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    fuse_bn=self.fuse_bn,
                    name=f"layer{stage}_{block}",
                )(x)

        embed_dim = self.width * 32
        return AttentionPool2d(
            embed_dim,
            self.heads,
            self.output_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attnpool",
        )(x)
