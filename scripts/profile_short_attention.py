#!/usr/bin/env python
"""FULL-MODEL measurement for the short-S merged-layout attention kernel.

DESIGN §5's iron rule: only full-model numbers move the dispatch policy.
This probe times the production ViT-B/32 tower and the complete extraction
step (preprocess + encode + zero-shot head) with attention forced to each
impl — "xla" (current auto choice at S=50) vs "short"
(ops/short_attention.py) — plus the 12-block stack and the causal text
tower, at several batch sizes.

    python scripts/profile_short_attention.py [BATCH=1024]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.models.layers import Transformer
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
PEAK_TF = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
GF_PER_IMG = 9.1  # ViT-B/32 encode+ZS (bench.py / XLA cost_analysis)

enable_persistent_cache()


def row(name, ms, gflops=None):
    if gflops is None:
        print(f"{name:52s} {ms:9.3f} ms")
        return
    tf = gflops / ms
    print(f"{name:52s} {ms:9.3f} ms {tf:8.1f} TF/s  ({tf / PEAK_TF:5.1%} peak)")


def stage_params(model):
    """Host-init + ONE packed upload (slow tunnel links)."""
    cpu = jax.devices("cpu")[0]
    res = model.config.image_resolution
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, res, res, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    return jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))


def main():
    print(f"backend: {jax.default_backend()}  batch: {BATCH}")
    models = {
        impl: create_clip("ViT-B/32", dtype=jnp.bfloat16, attn_impl=impl)
        for impl in ("xla", "short")
    }
    variables = stage_params(models["xla"])  # same tree for both impls
    res = models["xla"].config.image_resolution

    # ---- 12-block stack (S=50, D=768) at the tower's true FLOPs
    S, D, H, L = 50, 768, 12, 12
    tokens = jax.random.normal(jax.random.PRNGKey(3), (BATCH, S, D), jnp.bfloat16)
    gf_blocks = 2.0 * L * (
        12 * BATCH * S * D * D + 2 * BATCH * H * S * S * (D // H)
    ) / 1e9
    for impl in ("xla", "short"):
        mod = Transformer(D, L, H, dtype=jnp.bfloat16, attn_impl=impl)
        vs = jax.jit(mod.init)(jax.random.PRNGKey(0), tokens[:1])
        ms = chain_time(lambda v, t: mod.apply(v, t), vs, tokens, iters=12)
        row(f"12 blocks  [{impl}]", ms, gf_blocks)

    # ---- full visual encode
    images = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, res, res, 3), jnp.bfloat16
    )
    for impl, model in models.items():
        ms = chain_time(
            lambda v, im, m=model: m.apply(v, im, method=m.encode_image),
            variables, images, iters=16,
        )
        row(f"full visual encode  [{impl}]", ms, GF_PER_IMG * BATCH)

    # ---- causal text tower (S=77, D=512, 8 heads) at a large prompt batch
    toks = jax.random.randint(jax.random.PRNGKey(5), (BATCH, 77), 0, 49408)
    toks = toks.at[:, -1].set(49407)
    for impl, model in models.items():
        ms = chain_time(
            lambda v, t, m=model: m.apply(v, t, method=m.encode_text),
            variables, toks, iters=12,
        )
        row(f"text encode x{BATCH}  [{impl}]", ms)

    # ---- the headline: full extraction step (preprocess + encode + ZS)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        (rng.random((BATCH, 256, 256, 3)) * 255).astype(np.uint8)
    )
    zs = jnp.asarray(rng.standard_normal((512, 2)).astype(np.float32))

    for impl, model in models.items():
        def step(v, images_u8, m=model):
            x = preprocess_uint8(images_u8, res, dtype=jnp.bfloat16)
            emb = m.apply(v, x, method=m.encode_image)
            emb = emb.astype(jnp.float32)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb @ zs

        ms = chain_time(step, variables, raw, iters=16)
        ips = BATCH / ms * 1e3
        mfu = ips * GF_PER_IMG / 1e3 / PEAK_TF
        row(f"full extraction step  [{impl}]", ms, GF_PER_IMG * BATCH)
        print(f"    imgs/sec: {ips:,.0f}   MFU: {mfu:.3f}")

    print("done", time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
