"""Fused residual bottleneck block as one Pallas TPU kernel (inference).

The reference's Bottleneck (clip/model.py:10-55) is conv1x1 -> BN -> ReLU ->
conv3x3 -> BN -> ReLU -> conv1x1 -> BN, plus the identity residual and a
final ReLU.  With the BatchNorms folded into the convolutions
(weights/fold.py), the stride-1 block is a pure conv/bias/ReLU chain whose
intermediates XLA materializes in HBM between fusions.  This kernel keeps the
whole chain in VMEM — one image per grid cell, the 3x3 conv expressed as nine
shifted GEMMs over a zero-padded VMEM tile — so HBM traffic drops to the
block's input + output only.

Scope: stride == 1, in_channels == out_channels (the non-downsample blocks,
13 of RN50's 16), folded-BN inference.  Downsample blocks and training stay
on the XLA path.  Numerical contract: matches the XLA formulation to bf16
tolerance (f32 MXU accumulation, bf16 activation storage, residual added in
bf16 like the flax path).

MEASURED OUTCOME (v5e, batch 512, docs/DESIGN.md §8.5, two rounds): XLA
wins every block.  Round 2a, one image per cell: l2 3.78 vs 7.00 ms, l3
3.23 vs 4.96, l4 3.17 vs 4.51.  Round 2b applied the flash kernel's
batch-packing lesson (G images per grid cell, GEMM rows = G*H*W, VMEM
budget below): STILL 0.64-0.67x of XLA (l2 g=2: 8.9 vs 5.7 ms; l3 g=4:
7.4 vs 5.0) — unlike attention, the conv chain is not grid-step-bound;
XLA's native conv codegen simply beats the 3x3-as-nine-GEMMs formulation.
The kernel is therefore NOT wired into ModifiedResNet; it stays as the
measured record.  The model's conv pipeline already runs at ~50% MFU with
the deep stages at 75-90% of peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SHIFTS = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref):
    x = x_ref[...]  # [G, H, W, C] activations (bf16), G images per cell
    g, h, w, c = x.shape
    m = w1_ref.shape[1]

    # conv1 1x1 + bias + relu ([G*H*W, C] rows: packing images into the GEMM
    # M-dim is the same lesson as the flash kernel's block tuning — tiny
    # per-image GEMMs leave the grid step overhead-bound)
    y1 = jnp.dot(
        x.reshape(-1, c), w1_ref[...], preferred_element_type=jnp.float32
    )
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0).astype(x.dtype).reshape(g, h, w, m)

    # conv2 3x3 SAME as nine shifted GEMMs over the zero-padded tiles
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((g * h * w, m), jnp.float32)
    for i, (dy, dx) in enumerate(_SHIFTS):
        patch = y1p[:, dy : dy + h, dx : dx + w, :].reshape(-1, m)
        acc = acc + jnp.dot(
            patch, w2_ref[i], preferred_element_type=jnp.float32
        )
    y2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(x.dtype)

    # conv3 1x1 + bias, residual, final relu (residual added in bf16 — the
    # XLA path's dtype at the add)
    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
    y3 = (y3 + b3_ref[0]).astype(x.dtype).reshape(g, h, w, c)
    o_ref[...] = jnp.maximum(y3 + x, 0.0).astype(o_ref.dtype)


def _images_per_cell(b: int, h: int, w: int, c: int, m: int) -> int:
    """Largest packing that divides the batch within the VMEM budget
    (input + output tiles, padded intermediate, f32 accumulator)."""
    per_img = (
        2 * h * w * c * 2  # x + o, bf16
        + (h + 2) * (w + 2) * m * 2  # padded y1
        + h * w * m * 6  # f32 acc + bf16 y2
    )
    # Mosaic's scoped-vmem footprint measured ~2.7x this estimate (double-
    # buffered io blocks + f32 GEMM outputs before the casts), so the
    # estimate budget is 5.5 MB against the chip's 16 MB scoped limit.
    budget = int(5.5 * (1 << 20))
    for g in (16, 8, 4, 2):
        if b % g == 0 and g * per_img <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(
    x: jax.Array,  # [B, H, W, C]
    w1: jax.Array,  # [C, M]   (conv1 1x1 kernel, squeezed)
    b1: jax.Array,  # [M]
    w2: jax.Array,  # [3, 3, M, M]
    b2: jax.Array,  # [M]
    w3: jax.Array,  # [M, C]
    b3: jax.Array,  # [C]
    *,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    m = w1.shape[1]
    assert w3.shape == (m, c), (w3.shape, (m, c))
    dt = x.dtype
    w2r = w2.reshape(9, m, m)

    g = _images_per_cell(b, h, w, c, m)
    const = lambda bi: (0, 0)  # noqa: E731
    const3 = lambda bi: (0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, h, w, c), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((c, m), const),
            pl.BlockSpec((1, m), const),
            pl.BlockSpec((9, m, m), const3),
            pl.BlockSpec((1, m), const),
            pl.BlockSpec((m, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=pl.BlockSpec((g, h, w, c), lambda bi: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
    )(
        x,
        w1.astype(dt),
        b1.reshape(1, m).astype(jnp.float32),
        w2r.astype(dt),
        b2.reshape(1, m).astype(jnp.float32),
        w3.astype(dt),
        b3.reshape(1, c).astype(jnp.float32),
    )
