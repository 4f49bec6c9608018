"""Batched implicit-GEMM fused bottleneck (Pallas TPU, inference).

Second attack on the RN50 low-channel front (reference Bottleneck,
clip/model.py:10-55; roofline in docs/DESIGN.md §8: layer1 runs at 55% of its
lane-occupancy ceiling and is partially HBM-bound on its 256-channel
expansion tensors).  Round 2's ``ops/fused_bottleneck.py`` lost to XLA with a
3x3-as-nine-accumulated-GEMMs formulation (K=64 per GEMM, nine passes over
the padded tile, nine f32 accumulator read-modify-writes).  This kernel uses
the *implicit-GEMM* formulation instead:

- conv2 3x3 becomes ONE GEMM per row-strip: a patch matrix
  ``[rows, 9*M]`` is materialized in VMEM (nine static sub-tile copies —
  VPU work at VMEM bandwidth) and multiplied by the ``[9*M, M]`` reshaped
  kernel, so the MXU sees K=576 instead of nine K=64 passes.
- the whole block — conv1 1x1 + ReLU, conv2 3x3 + ReLU, conv3 1x1,
  optional downsample projection, residual add, final ReLU — stays in VMEM:
  HBM traffic is the block input + output only (XLA materializes each
  intermediate, incl. two round trips of the 4x-expanded tensor).
- row-strip tiling bounds VMEM: the padded mid tensor lives whole-image,
  patch/epilogue tensors are per-strip.

Scope: stride == 1 (every layer1 block; deeper stages' interior blocks),
folded-BN weights (weights/fold.py), bf16 storage with f32 MXU accumulation.
The ``downsample`` variant covers layer1 block 0 (in 64 -> out 256).

Numerical contract: equals the XLA conv formulation at bf16 tolerance
(pinned by tests/test_conv_gemm.py in interpret mode and on-chip).
MEASURED OUTCOME: see docs/DESIGN.md §8.6 — recorded either way, win or
null, like every kernel experiment in this repo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SHIFTS = tuple((dy, dx) for dy in range(3) for dx in range(3))


def _body(
    x_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    w3_ref,
    b3_ref,
    o_ref,
    y1p_ref,
    patch_ref,
    *,
    strip_rows: int,
    ds_refs=None,
):
    g, h, w, cin = x_ref.shape
    m = w1_ref.shape[1]
    cout = w3_ref.shape[1]
    dt = x_ref.dtype

    # conv1 1x1 + bias + relu over the whole cell -> zero-padded VMEM tile
    x = x_ref[...]
    y1 = jnp.dot(x.reshape(-1, cin), w1_ref[...], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0).astype(dt).reshape(g, h, w, m)
    # zero only the 1-px border, and only on the FIRST grid step: scratch
    # persists across steps, the interior is fully overwritten every step,
    # and nothing ever dirties the border — a full-tile zero per step
    # roughly doubled the kernel's VMEM store traffic on the expanded mid
    # tensor (post-dates the DESIGN §8.6 measurement; re-measure on TPU)
    @pl.when(pl.program_id(0) == 0)
    def _zero_border():
        y1p_ref[...] = jnp.zeros((g, h + 2, w + 2, m), dt)

    y1p_ref[:, 1 : h + 1, 1 : w + 1, :] = y1

    n_strips = h // strip_rows
    rows = g * strip_rows * w
    for s in range(n_strips):
        r0 = s * strip_rows
        # implicit-GEMM patch matrix: K laid out (dy, dx, cin) to match the
        # (kh, kw, I, O) conv kernel flattening
        for i, (dy, dx) in enumerate(_SHIFTS):
            sub = y1p_ref[:, r0 + dy : r0 + dy + strip_rows, dx : dx + w, :]
            patch_ref[:, i * m : (i + 1) * m] = sub.reshape(rows, m)
        y2 = jnp.dot(patch_ref[...], w2_ref[...], preferred_element_type=jnp.float32)
        y2 = jnp.maximum(y2 + b2_ref[0], 0.0).astype(dt)

        y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
        y3 = (y3 + b3_ref[0]).astype(dt)

        xs = x_ref[:, r0 : r0 + strip_rows, :, :].reshape(rows, cin)
        if ds_refs is not None:
            wd_ref, bd_ref = ds_refs
            res = jnp.dot(xs, wd_ref[...], preferred_element_type=jnp.float32)
            res = (res + bd_ref[0]).astype(dt)
        else:
            res = xs
        out = jnp.maximum(y3 + res, 0.0)
        o_ref[:, r0 : r0 + strip_rows, :, :] = out.reshape(
            g, strip_rows, w, cout
        ).astype(o_ref.dtype)


def _kernel_plain(x, w1, b1, w2, b2, w3, b3, o, y1p, patch, *, strip_rows):
    _body(x, w1, b1, w2, b2, w3, b3, o, y1p, patch, strip_rows=strip_rows)


def _kernel_ds(x, w1, b1, w2, b2, w3, b3, wd, bd, o, y1p, patch, *, strip_rows):
    _body(
        x, w1, b1, w2, b2, w3, b3, o, y1p, patch,
        strip_rows=strip_rows, ds_refs=(wd, bd),
    )


@functools.partial(
    jax.jit, static_argnames=("strip_rows", "images_per_cell", "interpret")
)
def fused_bottleneck_gemm(
    x: jax.Array,  # [B, H, W, Cin] (NHWC, bf16 or f32)
    w1: jax.Array,  # [Cin, M]  conv1 1x1 (BN-folded)
    b1: jax.Array,  # [M]
    w2: jax.Array,  # [3, 3, M, M]
    b2: jax.Array,  # [M]
    w3: jax.Array,  # [M, Cout]
    b3: jax.Array,  # [Cout]
    wd: jax.Array = None,  # [Cin, Cout] downsample 1x1, or None
    bd: jax.Array = None,  # [Cout]
    *,
    strip_rows: int = 8,
    images_per_cell: int = 1,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, cin = x.shape
    m = w1.shape[1]
    cout = w3.shape[1]
    assert h % strip_rows == 0, (h, strip_rows)
    g = images_per_cell
    assert b % g == 0, (b, g)
    dt = x.dtype
    rows = g * strip_rows * w

    w2r = w2.reshape(9 * m, m).astype(dt)
    const = lambda bi: (0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((g, h, w, cin), lambda bi: (bi, 0, 0, 0)),  # x
        pl.BlockSpec((cin, m), const),
        pl.BlockSpec((1, m), const),
        pl.BlockSpec((9 * m, m), const),
        pl.BlockSpec((1, m), const),
        pl.BlockSpec((m, cout), const),
        pl.BlockSpec((1, cout), const),
    ]
    args = [
        x,
        w1.astype(dt),
        b1.reshape(1, m).astype(jnp.float32),
        w2r,
        b2.reshape(1, m).astype(jnp.float32),
        w3.astype(dt),
        b3.reshape(1, cout).astype(jnp.float32),
    ]
    if wd is not None:
        kernel = functools.partial(_kernel_ds, strip_rows=strip_rows)
        assert bd is not None, "downsample weight wd requires its bias bd"
        in_specs += [
            pl.BlockSpec((cin, cout), const),
            pl.BlockSpec((1, cout), const),
        ]
        args += [wd.astype(dt), bd.reshape(1, cout).astype(jnp.float32)]
    else:
        assert cin == cout, (cin, cout)
        kernel = functools.partial(_kernel_plain, strip_rows=strip_rows)

    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, h, w, cout), lambda bi: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), dt),
        scratch_shapes=[
            # whole-cell padded mid tensor + per-strip patch matrix
            pltpu.VMEM((g, h + 2, w + 2, m), dt),
            pltpu.VMEM((rows, 9 * m), dt),
        ],
        interpret=interpret,
    )(*args)


def xla_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    """The XLA conv formulation of the same folded-BN block (baseline for
    parity tests and the measured comparison)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    cin, m = w1.shape
    cout = w3.shape[1]

    def conv(h, kern, pad):
        return jax.lax.conv_general_dilated(
            h, kern.astype(h.dtype), (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    y = conv(x, w1.reshape(1, 1, cin, m), "VALID")
    y = jnp.maximum(y + b1, 0.0).astype(x.dtype)
    y = conv(y, w2, "SAME")
    y = jnp.maximum(y + b2, 0.0).astype(x.dtype)
    y = conv(y, w3.reshape(1, 1, m, cout), "VALID")
    y = (y + b3).astype(x.dtype)
    if wd is not None:
        r = conv(x, wd.reshape(1, 1, cin, cout), "VALID")
        r = (r + bd).astype(x.dtype)
    else:
        r = x
    return jnp.maximum(y + r, 0.0)
