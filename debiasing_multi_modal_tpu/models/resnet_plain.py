"""Standard (torchvision-style) ResNet for from-scratch / SupCon training.

Parity surface: reference ``workspace/jinsu/resnet.py`` (:112-220) — the
legacy SupCon workspace's ResNet-50: 7x7 stride-2 stem + max pool, standard
stride-2 bottlenecks (no CLIP anti-aliasing), global average pool.  Unlike
the frozen CLIP towers this encoder is *trainable*, so it uses flax
BatchNorm with live batch statistics.

Not wired into the debiasing pipeline (the reference's workspace is not
either, SURVEY.md C19); exposed for the SupCon linear-evaluation harness
(train/linear_eval.py)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


# the reference initializes every conv with kaiming_normal(mode='fan_out',
# nonlinearity='relu') (workspace/jinsu/resnet.py:148-150); this module is
# the TRAINABLE from-scratch SupCon encoder, so initial scale matters
_KAIMING_FAN_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PlainBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)) if k > 1 else "VALID",
            use_bias=False, dtype=self.dtype, name=name,
            kernel_init=_KAIMING_FAN_OUT,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=name
        )
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(out_planes, 1, 1, "conv3")(out))
        if self.stride != 1 or inplanes != out_planes:
            x = bn("downsample_bn")(conv(out_planes, 1, self.stride, "downsample_conv")(x))
        return nn.relu(out + x)


class PlainResNet(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)  # ResNet-50
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """[N, H, W, 3] -> pooled features [N, width*32]."""
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
            kernel_init=_KAIMING_FAN_OUT,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (mult, blocks) in enumerate(zip((1, 2, 4, 8), self.layers), 1):
            for b in range(blocks):
                x = PlainBottleneck(
                    self.width * mult,
                    stride=2 if (b == 0 and stage > 1) else 1,
                    dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, train=train)
        return x.mean(axis=(1, 2))  # global average pool


def resnet50(dtype=jnp.float32) -> PlainResNet:
    return PlainResNet(layers=(3, 4, 6, 3), dtype=dtype)
