#!/usr/bin/env python
"""Per-component cost of one ViT-B/32 layer at the production batch shape.

profile_vit.py showed ~5.1 ms/layer steady state (71 TF/s) while the MLP
GEMMs alone sustain ~127 TF/s; standalone timings carry ~2.5 ms of fixed
per-program dispatch cost over the axon tunnel, so this script repeats each
component K times INSIDE one jitted program (lax.scan threading the
activation) and divides — dispatch-free numbers.

    python scripts/profile_vit_components.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.ops.attention import _xla_attention

B, S, D, H = 512, 50, 768, 12
K = 32  # in-program repetitions
ITERS = 8


def scan_time(fn, x, *consts):
    """Seconds per single application of fn, measured as K scanned reps."""

    @jax.jit
    def prog(acc, x):
        def body(carry, _):
            y = fn(carry, *consts)
            # keep carry shape: fold output back in (all fns preserve shape
            # or we wrap them so they do)
            return y, ()

        y, _ = jax.lax.scan(body, x, None, length=K)
        return acc + y.astype(jnp.float32).mean(), y

    acc, y = prog(jnp.float32(0.0), x)
    acc, y = prog(acc, x)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(ITERS):
        acc, y = prog(acc, x)
    float(acc)
    return (time.perf_counter() - t0) / (ITERS * K)


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32), jnp.bfloat16)
    wq = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.02)
    wfc = jnp.asarray(rng.standard_normal((D, 4 * D)).astype(np.float32) * 0.02)
    wpr = jnp.asarray(rng.standard_normal((4 * D, D)).astype(np.float32) * 0.02)
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)

    def report(name, dt, flops=None):
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        print(f"{name:38s} {dt * 1e3:8.3f} ms{tf}", flush=True)

    gf_proj = 2 * B * S * D * D

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)

    report("LayerNorm f32 (shape-preserving)", scan_time(ln, x))

    def proj(x, w):
        return (x @ w.astype(x.dtype)) * jnp.bfloat16(0.1)

    report("one [D,D] projection GEMM", scan_time(proj, x, wq), gf_proj)

    def qkvo(x, w):
        wd = w.astype(x.dtype)
        q = x @ wd
        k = x @ wd
        v = x @ wd
        return (q + k + v) @ wd * jnp.bfloat16(0.1)

    report("4 projection GEMMs (qkv+o)", scan_time(qkvo, x, wq), 4 * gf_proj)

    def sdpa(x):
        q = x.reshape(B, S, H, D // H)
        out = _xla_attention(q, q, q)
        return out.reshape(B, S, D)

    gf_sdpa = 2 * 2 * B * H * S * S * (D // H)
    report("sdpa (xla einsum attention)", scan_time(sdpa, x), gf_sdpa)

    def attn_full(x, w):
        wd = w.astype(x.dtype)
        q, k, v = x @ wd, x @ wd, x @ wd
        o = _xla_attention(
            q.reshape(B, S, H, D // H),
            k.reshape(B, S, H, D // H),
            v.reshape(B, S, H, D // H),
        ).reshape(B, S, D)
        return (o @ wd) * jnp.bfloat16(0.1)

    report("attention (qkv+sdpa+o)", scan_time(attn_full, x, wq),
           4 * gf_proj + gf_sdpa)

    def mlp(x, wfc, wpr):
        h = x @ wfc.astype(x.dtype)
        h = h * jax.nn.sigmoid(1.702 * h)
        return (h @ wpr.astype(x.dtype)) * jnp.bfloat16(0.1)

    gf_mlp = 2 * 2 * B * S * D * 4 * D
    report("mlp (fc+quickgelu+proj)", scan_time(mlp, x, wfc, wpr), gf_mlp)

    def full_layer(x, w, wfc, wpr):
        y = x + attn_full(ln(x), w)
        return y + mlp(ln(y), wfc, wpr)

    gf_layer = 4 * gf_proj + gf_sdpa + gf_mlp
    report("full layer (2LN+attn+mlp+res)",
           scan_time(full_layer, x, wq, wfc, wpr), gf_layer)

    # variant: sdpa in pure bf16 (logits+softmax bf16) to size the f32 cost
    def sdpa_bf16(x):
        q = x.reshape(B, S, H, D // H)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, q) * (D // H) ** -0.5
        wts = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", wts, q).reshape(B, S, D)

    report("sdpa all-bf16 (policy probe)", scan_time(sdpa_bf16, x), gf_sdpa)

    # variant: heads-merged attention — one [B*H, S, S] batched matmul layout
    def sdpa_merged(x):
        q = x.reshape(B, S, H, D // H).transpose(0, 2, 1, 3).reshape(B * H, S, D // H)
        logits = jnp.einsum(
            "bqd,bkd->bqk", q, q, preferred_element_type=jnp.float32
        ) * (D // H) ** -0.5
        wts = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bqk,bkd->bqd", wts, q)
        return o.reshape(B, H, S, D // H).transpose(0, 2, 1, 3).reshape(B, S, D)

    report("sdpa pre-transposed [B*H,S,Dh]", scan_time(sdpa_merged, x), gf_sdpa)


if __name__ == "__main__":
    main()
