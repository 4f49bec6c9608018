#!/usr/bin/env python
"""FULL-MODEL probe for the short-attention image-merge factor (§8.8).

DESIGN §5's iron rule: only full-model numbers move a dispatch policy.
This times the production ViT-B/32 visual encode and the complete
extraction step (preprocess + encode + zero-shot head) with the merged
S=50 attention kernel, under whatever DMT_SHORT_MERGE the environment
forces (the override is read once at short_attention import, so sweep in
FRESH processes):

    for m in 0 2 4; do DMT_SHORT_MERGE=$m python scripts/profile_short_merge.py 512; done

m=0 is the auto policy (pick_merge; currently 1).  Reference scope: the
S=50 regime of /root/reference/clip/model.py:206-240's ViT tower.

    python scripts/profile_short_merge.py [BATCH=512]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.ops import short_attention as sa
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
PEAK_TF = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
GF_PER_IMG = 9.1  # ViT-B/32 encode+ZS (bench.py / XLA cost_analysis)

enable_persistent_cache()


def main():
    merge = sa._FORCE_MERGE or sa.pick_merge(BATCH, 50, 768, 12)
    print(f"backend: {jax.default_backend()}  batch: {BATCH}  ",
          f"merge: {merge} (forced={bool(sa._FORCE_MERGE)})", flush=True)
    model = create_clip("ViT-B/32", dtype=jnp.bfloat16, attn_impl="short")
    res = model.config.image_resolution

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, res, res, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    images = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, res, res, 3), jnp.bfloat16
    )
    ms = chain_time(
        lambda v, im: model.apply(v, im, method=model.encode_image),
        variables, images, iters=16,
    )
    tf = GF_PER_IMG * BATCH / ms
    print(f"full visual encode   m={merge}: {ms:9.3f} ms  {tf:7.1f} TF/s "
          f"({tf / PEAK_TF:5.1%} peak)", flush=True)

    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((BATCH, 256, 256, 3)) * 255).astype(np.uint8))
    zs = jnp.asarray(rng.standard_normal((512, 2)).astype(np.float32))

    def step(v, images_u8):
        x = preprocess_uint8(images_u8, res, dtype=jnp.bfloat16)
        emb = model.apply(v, x, method=model.encode_image)
        emb = emb.astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb @ zs

    ms = chain_time(step, variables, raw, iters=16)
    ips = BATCH / ms * 1e3
    mfu = ips * GF_PER_IMG / 1e3 / PEAK_TF
    print(f"full extraction step m={merge}: {ms:9.3f} ms  "
          f"imgs/sec {ips:,.0f}  MFU {mfu:.3f}", flush=True)

    # text tower: S=77 pads 77 -> 128 lanes (1.66x waste), the other
    # candidate regime for the merge lever.  Causal attention; the kernel
    # combines the block-diagonal merge mask with the causal mask.
    rng_t = np.random.default_rng(1)
    toks = np.zeros((BATCH, 77), np.int32)
    vocab = model.config.vocab_size
    for i in range(BATCH):
        ln = int(rng_t.integers(8, 70))
        toks[i, 0] = vocab - 2
        toks[i, 1:ln - 1] = rng_t.integers(1, vocab - 3, ln - 2)
        toks[i, ln - 1] = vocab - 1
    toks = jnp.asarray(toks)
    ms = chain_time(
        lambda v, t: model.apply(v, t, method=model.encode_text),
        variables, toks, iters=16,
    )
    print(f"full text encode     m={merge}: {ms:9.3f} ms  "
          f"({BATCH / ms * 1e3:,.0f} prompts/sec)", flush=True)
    print("done", time.strftime("%H:%M:%S"), flush=True)


if __name__ == "__main__":
    main()
