#!/usr/bin/env python
"""Component budget for ViT-B/32's extraction MFU (VERDICT r3 item 3).

ViT-B/32 is the MFU laggard of the three benched backbones (0.452 vs ~0.50
for RN50 and ViT-L/14@336px).  This script decomposes the S=50 regime:

1. raw GEMM ladder at the tower's exact shapes, looped IN-PROGRAM
   (lax.fori_loop with a serial data dependency) so the tunnel's multi-ms
   per-dispatch floor doesn't pollute sub-5ms rows;
2. full visual encode vs blocks-only vs ablated block variants:
   - projections-only attention (softmax/score einsums removed) — isolates
     the score-machinery cost (the [B,H,50,50] tensor lane-pads 50->128);
   - fused qkv (one [768,2304] GEMM instead of three [768,768]);
3. batch scaling 512/1024/2048 and sequence padding 50->64/128 probes.

Findings go to docs/DESIGN.md §8.8.  Usage:

    python scripts/profile_vitb32_mfu.py [BATCH=1024]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.models.layers import (
    LayerNormF32,
    Transformer,
    quick_gelu,
)
from debiasing_multi_modal_tpu.ops.attention import multi_head_attention
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
S, D, HEADS, LAYERS = 50, 768, 12, 12
GF_PER_IMG = 9.1  # bench.py's ViT-B/32 figure (encode+ZS step accounting)
PEAK_TF = 197.0  # v5e bf16
LOOP = 32  # in-program GEMM repetitions

enable_persistent_cache()


def row(name, ms, gflops):
    tf = gflops / ms if ms > 0 else 0.0
    print(f"{name:46s} {ms:9.3f} ms {tf:8.1f} TF/s  ({tf / PEAK_TF:5.1%} peak)")
    return ms, tf


def gemm_loop_ms(m, k, n, reps=3):
    """ms per GEMM, measured as LOOP serial GEMMs inside ONE program (the
    w + tiny*acc perturbation defeats loop-invariant hoisting/CSE while
    costing only an elementwise pass over the 1-5 MB weight).  The carry
    consumes the FULL output via sum() — a single-element carry lets XLA
    dead-code-eliminate the GEMM down to one dot product (first run of this
    script reported 3-7x peak; sum() fuses into the GEMM epilogue, so the
    consumption itself costs one read of the output tile)."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

    @jax.jit
    def prog(a, w):
        def body(_, acc):
            out = a @ (w + (acc * 1e-30).astype(w.dtype))
            return out.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    float(prog(a, w))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = prog(a, w)
    float(acc)
    return (time.perf_counter() - t0) / reps / LOOP * 1e3


# ------------------------- ablated block variants (fresh params; rates only)


class AblatedBlock(nn.Module):
    """Pre-LN block with selectable attention treatment."""

    mode: str  # "baseline" | "fused_qkv" | "projs_only" | "fused_projs_only"

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(name="ln_1")(x)
        if self.mode in ("fused_qkv", "fused_projs_only"):
            qkv = nn.Dense(3 * D, dtype=jnp.bfloat16, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(D, dtype=jnp.bfloat16, name="q")(h)
            k = nn.Dense(D, dtype=jnp.bfloat16, name="k")(h)
            v = nn.Dense(D, dtype=jnp.bfloat16, name="v")(h)
        if self.mode in ("projs_only", "fused_projs_only"):
            attn = v + 0.001 * q + 0.001 * k  # keep q/k live, skip scores
        else:
            attn = multi_head_attention(q, k, v, HEADS, impl="xla")
        x = x + nn.Dense(D, dtype=jnp.bfloat16, name="out")(attn)
        h = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(4 * D, dtype=jnp.bfloat16, name="c_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(D, dtype=jnp.bfloat16, name="c_proj")(h)


class AblatedStack(nn.Module):
    mode: str

    @nn.compact
    def __call__(self, x):
        for i in range(LAYERS):
            x = AblatedBlock(self.mode, name=f"b{i}")(x)
        return x


def stack_ms(mode, tokens, iters=12):
    mod = AblatedStack(mode)
    vs = jax.jit(mod.init)(jax.random.PRNGKey(0), tokens[:1])
    return chain_time(lambda v, t: mod.apply(v, t), vs, tokens, iters=iters)


def main():
    print(f"backend: {jax.default_backend()}  batch: {BATCH}  S={S} D={D}")
    m = BATCH * S

    print("\n--- raw GEMM ladder (in-program loops; true rates) ---")
    shapes = [
        ("q/k/v/out proj  (m,768)x(768,768)", m, D, D),
        ("fused qkv       (m,768)x(768,2304)", m, D, 3 * D),
        ("c_fc            (m,768)x(768,3072)", m, D, 4 * D),
        ("c_proj          (m,3072)x(3072,768)", m, 4 * D, D),
        ("patch embed     (49B,3072)x(3072,768)", BATCH * 49, 3072, D),
        ("[ViT-L contrast] (m,1024)x(1024,4096)", m, 1024, 4096),
    ]
    rates = {}
    for name, mm, kk, nn_ in shapes:
        gf = 2.0 * mm * kk * nn_ / 1e9
        ms = gemm_loop_ms(mm, kk, nn_)
        rates[name] = row(name, ms, gf)

    per_block = (
        4 * rates["q/k/v/out proj  (m,768)x(768,768)"][0]
        + rates["c_fc            (m,768)x(768,3072)"][0]
        + rates["c_proj          (m,3072)x(3072,768)"][0]
    )
    per_block_fused = (
        rates["fused qkv       (m,768)x(768,2304)"][0]
        + rates["q/k/v/out proj  (m,768)x(768,768)"][0]
        + rates["c_fc            (m,768)x(768,3072)"][0]
        + rates["c_proj          (m,3072)x(3072,768)"][0]
    )
    sol = LAYERS * per_block + rates["patch embed     (49B,3072)x(3072,768)"][0]
    print(f"\nGEMM speed-of-light, 12 blocks + patch: {sol:.2f} ms "
          f"(fused-qkv variant {LAYERS * per_block_fused + rates['patch embed     (49B,3072)x(3072,768)'][0]:.2f} ms)")

    print("\n--- model components ---")
    model = create_clip("ViT-B/32", dtype=jnp.bfloat16)
    res = model.config.image_resolution
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, 3), jnp.bfloat16),
        jnp.zeros((1, 77), jnp.int32),
    )
    images = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, res, res, 3), jnp.bfloat16
    )

    def encode(v, im):
        return model.apply(v, im, method=model.encode_image)

    gf_tower = GF_PER_IMG * BATCH
    full_ms = chain_time(encode, variables, images, iters=16)
    row("full visual encode", full_ms, gf_tower)

    tokens = jax.random.normal(jax.random.PRNGKey(3), (BATCH, S, D), jnp.bfloat16)
    # true block FLOPs: 12*D^2 MACs/token (qkv 3 + out 1 + mlp 8) + scores
    gf_blocks = 2.0 * LAYERS * (
        12 * m * D * D + 2 * BATCH * HEADS * S * S * (D // HEADS)
    ) / 1e9
    tf_mod = Transformer(D, LAYERS, HEADS, dtype=jnp.bfloat16)
    tf_vars = jax.jit(tf_mod.init)(jax.random.PRNGKey(0), tokens[:1])
    blocks_ms = chain_time(lambda v, t: tf_mod.apply(v, t), tf_vars, tokens, iters=12)
    row("12 blocks (production modules)", blocks_ms, gf_blocks)

    for mode in ("baseline", "fused_qkv", "projs_only", "fused_projs_only"):
        ms = stack_ms(mode, tokens)
        row(f"12 ablated blocks [{mode}]", ms, gf_blocks)

    print(f"\npatchify+embed+head residual: {full_ms - blocks_ms:.2f} ms")
    print(f"fusion/elementwise tax vs GEMM SoL: {blocks_ms - sol:.2f} ms")

    print("\n--- scaling probes ---")
    for s_pad in (64, 128):
        tpad = jax.random.normal(
            jax.random.PRNGKey(4), (BATCH, s_pad, D), jnp.bfloat16
        )
        ms = chain_time(lambda v, t: tf_mod.apply(v, t), tf_vars, tpad, iters=8)
        gf = 2.0 * LAYERS * (
            12 * BATCH * s_pad * D * D
            + 2 * BATCH * HEADS * s_pad * s_pad * (D // HEADS)
        ) / 1e9
        row(f"blocks at S={s_pad} (padding probe)", ms, gf)

    for b in (512, 2048):
        im_b = jax.random.normal(
            jax.random.PRNGKey(5), (b, res, res, 3), jnp.bfloat16
        )
        ms = chain_time(encode, variables, im_b, iters=8)
        row(f"full visual encode  batch {b}", ms, GF_PER_IMG * b)

    print("\ndone")


if __name__ == "__main__":
    main()
