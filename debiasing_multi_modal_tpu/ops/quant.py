"""Dynamic int8 (W8A8) matmul for the GEMM-dominant transformer towers.

The reference runs its CUDA towers in fp16 end to end (clip/model.py:375-396);
this framework's measured-fast policy is fp32 params + bf16 compute
(docs/DESIGN.md §2).  This module adds one further *opt-in* inference lever:
quantize both the weight and the activation of a Dense layer to int8 and let
the MXU accumulate in int32 — v5e's int8 systolic-array peak is 2x its bf16
peak, and a ViT block's FLOPs are ~99% Dense GEMMs (q/k/v/out + c_fc/c_proj;
the attention dots are negligible at S<=577).

Scheme (standard dynamic W8A8, no calibration data needed):

- weights: symmetric per-OUTPUT-CHANNEL scales, ``s_w[n] = max|K[:, n]| / 127``;
- activations: symmetric per-ROW (per-token) scales computed on the fly,
  ``s_x[row] = max|x[row, :]| / 127`` — one VPU pass that fuses with the
  producing op;
- GEMM: ``int8 @ int8 -> int32`` via ``preferred_element_type``;
- epilogue: ``acc * (s_x outer s_w) + bias`` in f32, cast to the activation
  dtype.  Round-to-nearest quantization (inference only — stochastic rounding
  matters for training gradients, not for a frozen forward).

Accuracy: the per-layer relative error is bounded by the two quantization
steps (~1/254 each for well-spread rows); the model-level bound is pinned by
``tests/test_quant.py`` (per-layer relative Frobenius error and full-tower
embedding cosine vs the bf16 path).  int8 extraction is OPT-IN
(``create_clip(..., quant="int8")``) and should be
re-validated against real worst-group accuracy the day real weights/datasets
are available — synthetic fixtures can only pin the numerics, not the
science.

This is a *Dense* lever only: DESIGN §8 already measured that this XLA build
does not engage the int8 MXU path for convolutions (RN towers: 0.9-1.0x), so
the ResNet family stays bf16.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Smallest representable normal f32 — guards the all-zero-row / all-zero-column
# degenerate scales without perturbing any real scale.
_SCALE_FLOOR = jnp.finfo(jnp.float32).tiny


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization over the last axis.

    Returns ``(q, scale)`` with ``q`` int8 of x.shape and ``scale`` f32 of
    x.shape[:-1] + (1,) such that ``q * scale ~= x``.
    """
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _SCALE_FLOOR)
    q = jnp.round(x32 / scale).astype(jnp.int8)
    return q, scale


def quantize_cols_int8(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel (column) int8 quantization of a [K, N]
    weight matrix.  Returns ``(q, scale)`` with ``scale`` f32 of shape [N]."""
    k32 = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k32), axis=0) / 127.0
    scale = jnp.maximum(scale, _SCALE_FLOOR)
    q = jnp.round(k32 / scale).astype(jnp.int8)
    return q, scale


def int8_dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    out_dtype: Optional[Dtype] = None,
    impl: str = "xla",
) -> jax.Array:
    """``x @ kernel + bias`` with both operands dynamically quantized to int8.

    Args:
      x: [..., K] activations (any float dtype).
      kernel: [K, N] weights (any float dtype; quantized per output channel).
      bias: optional [N], added in f32 after dequantization.
      out_dtype: result dtype (defaults to ``x.dtype``).
      impl: "xla" (int8 dot_general) or "pallas" (ops/quant_gemm.py — the
        MXU-int8 backstop; bit-identical epilogue, interpreted off-TPU).

    The int8 GEMM accumulates in int32 on the MXU; the dequantization epilogue
    is a rank-1 f32 scaling that XLA fuses into the result write.
    """
    out_dtype = x.dtype if out_dtype is None else out_dtype
    qx, sx = quantize_rows_int8(x)
    qk, sk = quantize_cols_int8(kernel)
    lead = qx.shape[:-1]
    k = qx.shape[-1]
    n = kernel.shape[-1]
    if impl == "pallas":
        from debiasing_multi_modal_tpu.ops.attention import _on_tpu
        from debiasing_multi_modal_tpu.ops.quant_gemm import int8_matmul

        out = int8_matmul(
            qx.reshape(-1, k),
            qk,
            sx.reshape(-1, 1),
            sk,
            bias=None if bias is None else bias.astype(jnp.float32),
            out_dtype=jnp.dtype(out_dtype),
            interpret=not _on_tpu(),
        )
        return out.reshape(*lead, n)
    if impl != "xla":
        raise ValueError(f"unknown int8_dense impl {impl!r}")
    acc = jax.lax.dot_general(
        qx.reshape(-1, k),
        qk,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx.reshape(-1, 1) * sk[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.reshape(*lead, n).astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` replacement running the W8A8 path.

    Parameter names, shapes, dtypes and initializers match ``nn.Dense``
    exactly, so converted OpenAI checkpoints load unchanged and a quantized
    model's variable tree is identical to the bf16 model's.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_bias: bool = True
    impl: str = "xla"  # "xla" | "pallas" (ops/quant_gemm.py)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        return int8_dense(x, kernel, bias, out_dtype=self.dtype, impl=self.impl)
