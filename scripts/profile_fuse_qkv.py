#!/usr/bin/env python
"""FULL-MODEL probe for the fused [D, 3D] attention in-projection GEMM.

DESIGN §8.8 leaves the ViT-B/32 stack ~3.6 ms above its pure-GEMM
speed-of-light, with the projection GEMMs' shape-limited rates (768-wide
K/N at 47-80% of peak) the last unprobed lever (VERDICT r4 item 6).
``fuse_qkv=True`` turns each block's three narrow in-projections into one
[D, 3D] GEMM (the torch in_proj layout, reference clip/model.py:171-192);
this measures the production encode + extraction step both ways in ONE
process (two module configs = two programs; no env forcing needed).

    python scripts/profile_fuse_qkv.py [BACKBONE=ViT-B/32] [BATCH=512]
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
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

BACKBONE = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/32"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512
PEAK_TF = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
GF = {"ViT-B/32": 9.1, "ViT-L/14": 164.0, "ViT-L/14@336px": 383.0}

enable_persistent_cache()


def main():
    print(f"backend: {jax.default_backend()}  {BACKBONE}  batch: {BATCH}",
          flush=True)
    gf = GF.get(BACKBONE, 0.0)

    model0 = create_clip(BACKBONE, dtype=jnp.bfloat16)
    res = model0.config.image_resolution
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model0.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, res, res, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    images = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, res, res, 3), jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    raw = jnp.asarray((rng.random((BATCH, 256, 256, 3)) * 255).astype(np.uint8))
    zs = jnp.asarray(rng.standard_normal((512, 2)).astype(np.float32))

    for fuse in (False, True):
        model = create_clip(BACKBONE, dtype=jnp.bfloat16, fuse_qkv=fuse)

        ms = chain_time(
            lambda v, im: model.apply(v, im, method=model.encode_image),
            variables, images, iters=16,
        )
        tf = gf * BATCH / ms
        print(f"full visual encode   fuse_qkv={fuse!s:5}: {ms:9.3f} ms  "
              f"{tf:7.1f} TF/s ({tf / PEAK_TF:5.1%} peak)", flush=True)

        def step(v, images_u8):
            x = preprocess_uint8(images_u8, res, dtype=jnp.bfloat16)
            emb = model.apply(v, x, method=model.encode_image)
            emb = emb.astype(jnp.float32)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb @ zs

        ms = chain_time(step, variables, raw, iters=16)
        ips = BATCH / ms * 1e3
        print(f"full extraction step fuse_qkv={fuse!s:5}: {ms:9.3f} ms  "
              f"imgs/sec {ips:,.0f}  MFU {ips * gf / 1e3 / PEAK_TF:.3f}",
              flush=True)
    print("done", time.strftime("%H:%M:%S"), flush=True)


if __name__ == "__main__":
    main()
