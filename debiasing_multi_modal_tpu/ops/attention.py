"""Fused multi-head attention for TPU.

This is the single attention primitive used by every transformer block in the
framework (text transformer, ViT, and the single-query attention pool of the
ModifiedResNet — reference ``clip/model.py``:58-91, 171-192).

Three interchangeable implementations:

- ``xla``: plain einsum attention.  The CPU/debug path and the mid-range
  fallback; XLA fuses it well when the score tensor fits memory.
- ``short``: the whole-sequence merged-layout Pallas kernel
  (:mod:`debiasing_multi_modal_tpu.ops.short_attention`) for self-attention
  whose per-image cell fits VMEM (S=50..577 measured) — the full-model
  winner on TPU across the whole CLIP family (ViT-B/32 extraction +32%,
  ViT-L/14 +37%, ViT-L/14@336px +42% — docs/DESIGN.md §8.8), preferred by
  ``auto`` whenever :func:`short_attention.supported` holds.
- ``pallas``: a blockwise (flash-style) kernel written in Pallas
  (:mod:`debiasing_multi_modal_tpu.ops.flash_attention`) for the
  prohibitive-score long-sequence regime, written blockwise so longer
  contexts get it for free.

Numerics policy (measured, round 2): attention logits are *stored* in the
activation dtype (one rounding at the MXU epilogue) while the softmax math
itself always runs in float32 — the upcast fuses into the softmax pass, so
no f32 score tensor ever hits HBM.  For f32 activations (CPU/tests) this is
exactly all-f32 attention.  For bf16 activations it halves the score-tensor
traffic: measured in-context on v5e (full ViT-B/32 encode, bs512) 63.4 ms ->
52.2 ms (+21% throughput); per-layer output cosine >= 0.997 even at extreme
logit scale (test_attention.py::test_bf16_logit_rounding_bound).  The
reference stores these logits in fp16 end to end (``convert_weights``,
clip/model.py:375-396) and runs its softmax in fp16 too — bf16 storage with
f32 softmax accumulation is no less faithful than the CUDA original.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "auto"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = _DEFAULT_IMPL,
) -> jax.Array:
    """Scaled dot-product attention over head-split inputs.

    Args:
      q: [batch, q_len, num_heads, head_dim]
      k, v: [batch, kv_len, num_heads, head_dim]
      mask: optional additive mask broadcastable to [batch, heads, q_len,
        kv_len] (float, ``-inf`` to exclude), matching the additive causal
        mask of reference clip/model.py:328-334.
      causal: build the standard causal mask internally (preferred over
        passing a materialized 77x77 mask).
      impl: "xla", "pallas", or "auto" (pallas on TPU when shapes qualify).

    Returns:
      [batch, q_len, num_heads, head_dim] in q.dtype.
    """
    if impl == "auto":
        impl = "xla"
        if _on_tpu():
            from debiasing_multi_modal_tpu.ops import flash_attention as fa

            if fa.supported(q, k, v, mask=mask):
                impl = "pallas"
    if impl == "pallas":
        from debiasing_multi_modal_tpu.ops import flash_attention as fa

        return fa.flash_attention(q, k, v, mask=mask, causal=causal)
    return _xla_attention(q, k, v, mask=mask, causal=causal)


def _xla_attention(q, k, v, *, mask=None, causal=False):
    orig_dtype = q.dtype
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # [B, H, Sq, Skv] logits stored in the activation dtype (module docstring:
    # the MXU accumulates in f32 and rounds once at the epilogue; the 1/sqrt(64)
    # scale is a power of two, exact in bf16).  f32 inputs -> all-f32, as before.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    logits = logits * jnp.asarray(scale, logits.dtype)
    if causal:
        q_len, kv_len = q.shape[1], k.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
        logits = jnp.where(col <= row, logits, jnp.asarray(-jnp.inf, logits.dtype))
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    # softmax math in f32 regardless of storage dtype (upcast fuses into the
    # softmax pass — no f32 score tensor is materialized for bf16 inputs)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)


@functools.partial(jax.named_call, name="multi_head_attention")
def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = _DEFAULT_IMPL,
) -> jax.Array:
    """Attention over merged-head inputs [batch, seq, model_dim].

    ``impl="short"`` selects the whole-sequence merged-layout kernel
    (:mod:`debiasing_multi_modal_tpu.ops.short_attention`), which consumes
    q/k/v in THIS layout directly — no head-split reshape, no transposes.
    On TPU, ``auto`` prefers it whenever the shape qualifies: it is the one
    kernel that beat XLA in a FULL-MODEL measurement (ViT-B/32 extraction
    9,812 -> 12,910 imgs/s, +32% — docs/DESIGN.md §8.8); longer sequences
    fall through to the flash/XLA policy below.
    """
    if impl == "auto" and _on_tpu():
        from debiasing_multi_modal_tpu.ops import short_attention as sa

        if sa.supported(q, k, v, num_heads, mask=mask):
            impl = "short"
    if impl == "short":
        from debiasing_multi_modal_tpu.ops import short_attention as sa

        if mask is not None:
            raise ValueError("additive masks use the XLA path")
        return sa.short_attention(q, k, v, num_heads, causal=causal)
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    q = q.reshape(b, sq, num_heads, hd)
    k = k.reshape(b, skv, num_heads, hd)
    v = v.reshape(b, skv, num_heads, hd)
    out = dot_product_attention(q, k, v, mask=mask, causal=causal, impl=impl)
    return out.reshape(b, sq, d)


@functools.partial(jax.named_call, name="multi_head_attention_packed")
def multi_head_attention_packed(
    qkv: jax.Array,
    num_heads: int,
    *,
    causal: bool = False,
    impl: str = _DEFAULT_IMPL,
) -> jax.Array:
    """Attention over lane-packed qkv [batch, seq, 3*model_dim] (q | k | v
    along lanes — the fused [D, 3D] in-projection GEMM's output layout,
    ``fuse_qkv=True``).

    When the short kernel takes the shape, the packed slab feeds
    :func:`short_attention.short_attention_packed` DIRECTLY — no
    ``jnp.split`` copies between the GEMM and the kernel (the split tax
    measured -14% full-model, DESIGN §8.8 round 5).  Every other impl
    splits here and follows :func:`multi_head_attention`'s dispatch."""
    from debiasing_multi_modal_tpu.ops import short_attention as sa

    if (impl == "short" or (impl == "auto" and _on_tpu())) and (
        sa.supported_packed(qkv, num_heads)
    ):
        return sa.short_attention_packed(qkv, num_heads, causal=causal)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return multi_head_attention(q, k, v, num_heads, causal=causal, impl=impl)
