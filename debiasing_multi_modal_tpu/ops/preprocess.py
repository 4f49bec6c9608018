"""On-device image preprocessing: resize + center crop + normalize.

Parity surface: the reference preprocessing chain (clip_inference.py:32-33 +
clip/clip.py:79-86).  Note the composition subtlety: the extraction driver
prepends its own ``Resize(224)`` (torchvision default = BILINEAR, long side
TRUNCATED via ``int(size * long / short)``) + ``CenterCrop(224)``; CLIP's own
``Resize(224, BICUBIC)`` then no-ops because the short side already equals
224.  The net reference transform is therefore: shorter-side BILINEAR resize
(antialiased, truncated long side) -> center crop -> normalize — which is
this module's default.  ``method="bicubic"`` gives the standalone
``clip.load`` preprocessing for pipelines that skip the extra crop.

TPU-first: the whole transform is one jitted function over a fixed-shape
``uint8 [N, H, W, 3]`` batch — the host only decodes; scaling, cropping and
normalization are fused on device, so per-image Python never touches the hot
loop (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# CLIP normalization constants (clip/clip.py:85)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resized_dims(h: int, w: int, target: int) -> Tuple[int, int]:
    """torchvision Resize(shorter-side) output size.  The long side is
    TRUNCATED (``int(size * long / short)``), matching torchvision's
    ``_compute_resized_output_size``."""
    if h <= w:
        return target, max(target, int(w * target / h))
    return max(target, int(h * target / w)), target


def _cubic_kernel(t: "np.ndarray") -> "np.ndarray":
    """Keys cubic (a = -0.5) — the kernel behind bicubic resampling."""
    import numpy as np

    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        1.5 * t ** 3 - 2.5 * t ** 2 + 1.0,
        np.where(t < 2.0, -0.5 * t ** 3 + 2.5 * t ** 2 - 4.0 * t + 2.0, 0.0),
    )
    return out


def _linear_kernel(t: "np.ndarray") -> "np.ndarray":
    """Triangle kernel — bilinear resampling."""
    import numpy as np

    return np.maximum(0.0, 1.0 - np.abs(t))


@functools.lru_cache(maxsize=64)
def resize_matrix(
    in_size: int, out_size: int, antialias: bool = True, method: str = "bilinear"
):
    """[out_size, in_size] separable resampling matrix.

    Resizing along one axis is a linear map; materializing it turns the whole
    resize into two small matmuls that XLA schedules on the MXU.  The
    gather-based ``jax.image.resize`` lowering takes *minutes* to compile on
    TPU for batched NHWC inputs — this formulation compiles in milliseconds
    and runs faster.  Kernel semantics (half-pixel sampling, antialiased
    support scaling for downsampling, edge clamping via weight
    renormalization) match ``jax.image.resize`` for the same method.
    """
    import numpy as np

    kernel = {"bilinear": _linear_kernel, "bicubic": _cubic_kernel}[method]
    scale = out_size / in_size
    kscale = max(1.0, 1.0 / scale) if antialias else 1.0
    # output pixel centers mapped into input coordinates (half-pixel centers)
    x = (np.arange(out_size) + 0.5) / scale - 0.5
    j = np.arange(in_size)
    t = (x[:, None] - j[None, :]) / kscale
    weights = kernel(t) / kscale
    weights = weights / weights.sum(axis=1, keepdims=True)
    return weights.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("resolution", "antialias", "dtype", "method")
)
def preprocess_uint8(
    images: jax.Array,
    resolution: int = 224,
    antialias: bool = True,
    dtype=jnp.float32,
    method: str = "bilinear",
) -> jax.Array:
    """uint8 [N, H, W, 3] -> CLIP-normalized [N, resolution, resolution, 3].

    H and W are static per compiled shape; the resize matrices and crop
    offsets are computed at trace time, so the jitted program is two f32
    matmuls + crop + normalize with no dynamic shapes and no gathers.
    Default ``method="bilinear"`` matches the reference extraction pipeline
    (see module docstring); use ``"bicubic"`` for standalone clip.load
    semantics.
    """
    n, h, w, c = images.shape
    x = images.astype(jnp.float32) / 255.0

    rh, rw = resized_dims(h, w, resolution)
    top = int(round((rh - resolution) / 2.0))
    left = int(round((rw - resolution) / 2.0))

    if (rh, rw) != (h, w):
        # Layout: the contractions run CHANNELS-FIRST so their minor dims are
        # the >=128-wide spatial axes, not the 3-wide channel axis (which TPU
        # tiling pads to 128 lanes — measured 3x slower end-to-end).  The
        # center crop is folded into the resize matrices (a row slice of a
        # linear map), so the cropped-away rows are never computed.
        x = x.transpose(0, 3, 1, 2)  # [n, c, h, w]
        if rh != h:
            mh = jnp.asarray(
                resize_matrix(h, rh, antialias, method)[top : top + resolution]
            )
            x = jnp.einsum(
                "oh,nchw->ncow", mh, x, precision=jax.lax.Precision.HIGHEST
            )
            if dtype == jnp.bfloat16 and rw != w:
                # store the intermediate between the two resizes in the
                # requested activation dtype: pixels are [0,1]-scale, the
                # rounding is <=0.002 (under the downstream bf16 conv noise),
                # and the pass is bandwidth-bound (DESIGN §8).  The next
                # einsum promotes back to f32 at HIGHEST precision.
                x = x.astype(jnp.bfloat16)
        else:
            x = jax.lax.slice_in_dim(x, top, top + resolution, axis=2)
        if rw != w:
            mw = jnp.asarray(
                resize_matrix(w, rw, antialias, method)[left : left + resolution]
            )
            x = jnp.einsum(
                "pw,ncow->ncop", mw, x, precision=jax.lax.Precision.HIGHEST
            )
        else:
            x = jax.lax.slice_in_dim(x, left, left + resolution, axis=3)
        # PIL clamps resampled values into the valid range
        x = jnp.clip(x, 0.0, 1.0)
        x = x.transpose(0, 2, 3, 1)  # back to NHWC for the conv stem
    else:
        x = jax.lax.slice(
            x, (0, top, left, 0), (n, top + resolution, left + resolution, c)
        )

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def normalize_only(images_01: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Normalize an already-resized [0,1] float batch (bench/synthetic path)."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((images_01.astype(jnp.float32) - mean) / std).astype(dtype)
