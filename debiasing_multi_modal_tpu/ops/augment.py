"""On-device training augmentations.

Parity surface: reference ``get_transform_cub(train=True)``
(data/waterbirds.py:78-98) — RandomResizedCrop(224, scale=(0.7, 1.0)) +
RandomHorizontalFlip — and ``TwoCropTransform`` (demo/util.py:9-15) used by
the SupCon workspace.

TPU-first: crops are affine bilinear sampling with per-image random boxes —
dynamic *values*, static *shapes* — so a whole batch augments inside one
jitted program with a JAX PRNG key (no per-image host Python)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img [H, W, C], ys/xs [R, R] float source coords -> [R, R, C]."""
    h, w, _ = img.shape
    # clamp the SAMPLING coordinates, not just the gather indices: clamping
    # only the floored index while computing the fractional weight against
    # the unclamped coordinate extrapolates past the edge (emits values
    # outside the input range, measured up to 1.27 from a [0,1] image).
    # PIL/torchvision clamp the source coords the same way.
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(ys.dtype))[..., None]
    wx = (xs - x0.astype(xs.dtype))[..., None]
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


@functools.partial(
    jax.jit, static_argnames=("out_res", "scale_range", "ratio_range")
)
def random_resized_crop(
    key: jax.Array,
    images: jax.Array,  # [N, H, W, C] float
    out_res: int = 224,
    scale_range: Tuple[float, float] = (0.7, 1.0),
    ratio_range: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jax.Array:
    """torchvision RandomResizedCrop semantics (area-scale + aspect sample,
    bilinear resize), vectorized over the batch."""
    n, h, w, c = images.shape
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(
        k_area, (n,), minval=scale_range[0], maxval=scale_range[1]
    ) * (h * w)
    log_r = jax.random.uniform(
        k_ratio, (n,),
        minval=jnp.log(ratio_range[0]), maxval=jnp.log(ratio_range[1]),
    )
    ratio = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ratio), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / ratio), 1.0, h)
    y0 = jax.random.uniform(k_y, (n,)) * (h - ch)
    x0 = jax.random.uniform(k_x, (n,)) * (w - cw)

    grid = (jnp.arange(out_res) + 0.5) / out_res  # [R] in (0, 1)

    def sample_one(img, y0i, x0i, chi, cwi):
        ys = y0i + grid[:, None] * chi - 0.5
        xs = x0i + grid[None, :] * cwi - 0.5
        ys = jnp.broadcast_to(ys, (out_res, out_res))
        xs = jnp.broadcast_to(xs, (out_res, out_res))
        return _bilinear_sample(img, ys, xs)

    return jax.vmap(sample_one)(images, y0, x0, ch, cw)


@jax.jit
def random_horizontal_flip(key: jax.Array, images: jax.Array) -> jax.Array:
    n = images.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (n,))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


def train_augment(
    key: jax.Array,
    images: jax.Array,
    out_res: int = 224,
    scale_range: Tuple[float, float] = (0.7, 1.0),
) -> jax.Array:
    """RandomResizedCrop + RandomHorizontalFlip (get_transform_cub train)."""
    k1, k2 = jax.random.split(key)
    out = random_resized_crop(k1, images, out_res, scale_range)
    return random_horizontal_flip(k2, out)


def two_crop(key: jax.Array, images: jax.Array, out_res: int = 224):
    """Two independent augmented views per image (TwoCropTransform)."""
    k1, k2 = jax.random.split(key)
    return train_augment(k1, images, out_res), train_augment(k2, images, out_res)
