#!/usr/bin/env python
"""In-context measurement of attention-softmax dtype policies on ViT-B/32.

profile_vit_components.py located ~2.0 ms/layer in the XLA sdpa, dominated by
materializing f32 logits/weights for a [B,H,50,50] score tensor whose 50-lane
last dim pads to 128.  Candidate policies (bf16 activations):

- f32:   current — f32 logits (MXU preferred f32), f32 softmax, cast to bf16.
- bf16logits: logits rounded to bf16 at the einsum epilogue, softmax still
  computed in f32 (upcast fuses into the softmax pass — halves HBM traffic).
- bf16:  logits and softmax all bf16 (reference CLIP itself runs fp16 here,
  clip/model.py:375-396).

Per CLAUDE.md the dispatch/numerics policy only changes on IN-CONTEXT
encoder measurements — this script times the full encode and reports the
embedding deltas vs the f32 policy.

    python scripts/profile_vit_attn_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.utils.timing import (
    chain_time as _chain_time_ms,
)
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.ops import attention as attn_mod
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree

BATCH = 512
ITERS = 16


def chain_time(fn, *args):
    """Mean seconds per call — the shared accumulator-chain
    harness (utils/timing.py), so the measured-barrier policy has
    exactly one implementation across every perf script."""
    return _chain_time_ms(fn, *args, iters=ITERS) / 1e3


def xla_attention_variant(policy):
    def _attn(q, k, v, *, mask=None, causal=False):
        orig_dtype = q.dtype
        head_dim = q.shape[-1]
        scale = head_dim ** -0.5
        if policy == "f32":
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
        else:  # bf16logits / bf16: round logits to the activation dtype
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(
                scale, q.dtype
            )
        if causal:
            q_len, kv_len = q.shape[1], k.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
            logits = jnp.where(col <= row, logits, jnp.asarray(-jnp.inf, logits.dtype))
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        if policy == "bf16":
            weights = jax.nn.softmax(logits, axis=-1)
        else:  # softmax math in f32 (upcast fuses into the softmax pass)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out.astype(orig_dtype)

    return _attn


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    print("backend:", jax.default_backend())
    model = create_clip("ViT-B/32", dtype=jnp.bfloat16)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        (rng.random((BATCH, 256, 256, 3)) * 255).astype(np.uint8)
    )
    x224 = jax.jit(lambda im: preprocess_uint8(im, 224, dtype=jnp.bfloat16))(images)

    enc = lambda v, x: model.apply(v, x, method=model.encode_image)  # noqa: E731

    results = {}
    orig = attn_mod._xla_attention
    try:
        for policy in ("f32", "bf16logits", "bf16"):
            attn_mod._xla_attention = xla_attention_variant(policy)
            dt = chain_time(enc, variables, x224)
            emb = np.asarray(jax.jit(enc)(variables, x224), np.float32)
            results[policy] = (dt, emb)
            print(f"{policy:12s} encode {dt*1e3:7.2f} ms  "
                  f"{BATCH/dt:8,.0f} imgs/s", flush=True)
    finally:
        attn_mod._xla_attention = orig

    ref = results["f32"][1]
    refn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    for policy in ("bf16logits", "bf16"):
        emb = results[policy][1]
        embn = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        cos = (refn * embn).sum(-1)
        print(f"{policy:12s} vs f32: max|d|={np.abs(emb-ref).max():.4g} "
              f"rel={np.abs(emb-ref).max()/np.abs(ref).max():.4g} "
              f"min cos={cos.min():.6f}")


if __name__ == "__main__":
    main()
