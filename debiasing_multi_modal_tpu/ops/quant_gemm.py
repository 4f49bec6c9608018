"""Pallas int8 GEMM with fused dequantization epilogue (TPU).

Backstop for the dynamic W8A8 path (ops/quant.py): the XLA route lowers a
genuine ``i8 x i8 -> i32`` dot_general, but whether this XLA build maps it
onto the v5e MXU's 2x-peak int8 path is an empirical question — the same
build declined to engage int8 for convolutions (docs/DESIGN.md §8).  This
kernel removes that dependency: each grid cell multiplies an int8
``[block_m, K]`` row tile by an int8 ``[K, block_n]`` column tile with int32
MXU accumulation and applies the rank-1 f32 dequant (+ bias) in VMEM before
the single output write — the int32 accumulator never touches HBM.

Layout contract: whole-K cells (CLIP widths are K <= 4096: at block 512x512
the VMEM footprint is ~4.5 MB for K=3072), grid (M/block_m, N/block_n).
The wrapper pads M up to block_m and slices the result; N and K must be
lane/sublane aligned (multiples of 128 / 32 — all CLIP Dense shapes are).

Numerical contract: the integer GEMM is exact (same int32 accumulation as
the XLA path); the f32 dequant epilogue agrees to ulps (<= 2 measured —
fusion order differs between compilers), pinned by
tests/test_quant.py::test_pallas_int8_matmul_matches_xla.  Selected via
``int8_dense(..., impl="pallas")`` / model knob ``quant="int8_pallas"``;
the default stays "int8" (XLA) until the on-chip measurement says otherwise
(§8.7 records the outcome either way, win or null).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _body(qx_ref, qk_ref, sx_ref, sk_ref, bias_ref, o_ref):
    acc = jax.lax.dot_general(
        qx_ref[...],
        qk_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # same association as the XLA epilogue in ops/quant.py: (acc * sx) * sk
    out = acc.astype(jnp.float32) * sx_ref[...] * sk_ref[...]
    if bias_ref is not None:
        out = out + bias_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_block(dim: int, preferred: int) -> int:
    """Largest of (preferred, 512, 256, 128) that divides ``dim`` — loud
    error otherwise, so a bad tuning knob can't degenerate into a whole-N
    block and an obscure Mosaic VMEM failure."""
    for b in (preferred, 512, 256, 128):
        if b <= preferred and dim % b == 0:
            return b
    raise ValueError(
        f"no block size <= {preferred} in (512, 256, 128) divides N={dim}"
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "out_dtype", "interpret"),
)
def int8_matmul(
    qx: jax.Array,  # [M, K] int8
    qk: jax.Array,  # [K, N] int8
    sx: jax.Array,  # [M, 1] f32 per-row scales
    sk: jax.Array,  # [N] f32 per-column scales
    bias: Optional[jax.Array] = None,  # [N] f32
    *,
    block_m: int = 512,
    block_n: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    m, k = qx.shape
    k2, n = qk.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {qx.shape} @ {qk.shape}")
    if n % 128:
        raise ValueError(
            f"N ({n}) must be a multiple of 128 (int8 lane tile); every CLIP "
            "Dense output dim is — pad in the caller for other shapes"
        )
    # K is qx's LANE dim (tile 128) and qk's sublane dim (tile 32): pad to
    # the stricter 128 so the real-TPU layout is aligned, not just interpret
    # mode.  Zero columns/rows contribute exact zeros to the integer GEMM.
    pad_k = (-k) % 128  # e.g. the ViT-L/14 patch GEMM, K = 14*14*3 = 588 -> 640
    if pad_k:
        qx = jnp.pad(qx, ((0, 0), (0, pad_k)))
        qk = jnp.pad(qk, ((0, pad_k), (0, 0)))
        k += pad_k
    if block_m % 32:
        raise ValueError(f"block_m ({block_m}) must be a multiple of 32 "
                         "(int8 sublane tile)")
    bn = _pick_block(n, block_n)
    bm = min(block_m, m + (-m) % 32)  # int8 sublane multiple
    pad_m = (-m) % bm
    if pad_m:
        qx = jnp.pad(qx, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)), constant_values=1.0)
    mp = m + pad_m

    sk2 = sk.reshape(1, n)
    operands = [qx, qk, sx, sk2]
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
    ]
    if bias is not None:
        operands.append(bias.reshape(1, n).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        body = _body
    else:
        body = functools.partial(_call_without_bias, _body)

    out = pl.pallas_call(
        body,
        grid=(mp // bm, n // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(*operands)
    return out[:m] if pad_m else out


def _call_without_bias(body, qx_ref, qk_ref, sx_ref, sk_ref, o_ref):
    body(qx_ref, qk_ref, sx_ref, sk_ref, None, o_ref)
