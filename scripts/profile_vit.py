#!/usr/bin/env python
"""Stage-level time breakdown of the ViT-B/32 extraction step on the TPU.

Companion to scripts/profile_rn50.py (same chained-accumulator timing
harness): times the preprocess, the patchify GEMM, cumulative transformer
depth prefixes, the attention vs MLP sub-blocks at the real batch shape, and
the full encode/step, to locate the gap between the measured encode time and
the GEMM-only roofline (docs/DESIGN.md §8).  Reference hot path: the ViT
branch of the extraction loop (/root/reference/clip_inference.py:202-257,
clip/model.py:206-240).

    python scripts/profile_vit.py [BATCH]
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
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
RES_IN = 256
ITERS = 16
VIT_GF_PER_IMG = 9.1e9  # XLA cost analysis (docs/DESIGN.md §1)


def chain_time(fn, *args):
    """Mean seconds per call — the shared accumulator-chain
    harness (utils/timing.py), so the measured-barrier policy has
    exactly one implementation across every perf script."""
    return _chain_time_ms(fn, *args, iters=ITERS) / 1e3


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    print("backend:", jax.default_backend(), " batch:", BATCH)
    model = create_clip("ViT-B/32", dtype=jnp.bfloat16)
    cfg = model.config
    width, layers, heads = cfg.vision_width, cfg.vision_layers, cfg.vision_width // 64
    seq = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1  # 50

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
        (rng.random((BATCH, RES_IN, RES_IN, 3)) * 255).astype(np.uint8)
    )
    x224 = jax.jit(lambda im: preprocess_uint8(im, 224, dtype=jnp.bfloat16))(images)
    text = jnp.asarray(rng.standard_normal((cfg.embed_dim, 2)).astype(np.float32))

    rows = []

    def report(name, dt, flops=None):
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        rows.append(f"{name:34s} {dt * 1e3:8.2f} ms{tf}")
        print(rows[-1], flush=True)

    # --- isolated pieces at the real shapes -------------------------------
    dt = chain_time(lambda im: preprocess_uint8(im, 224, dtype=jnp.bfloat16), images)
    report("preprocess 256->224", dt)

    tokens = jnp.asarray(
        rng.standard_normal((BATCH, seq, width)).astype(np.float32), jnp.bfloat16
    )
    hidden = jnp.asarray(
        rng.standard_normal((BATCH, seq, 4 * width)).astype(np.float32), jnp.bfloat16
    )
    wq = jnp.asarray(rng.standard_normal((width, width)).astype(np.float32))
    wfc = jnp.asarray(rng.standard_normal((width, 4 * width)).astype(np.float32))
    wpr = jnp.asarray(rng.standard_normal((4 * width, width)).astype(np.float32))

    # one projection GEMM [B*S, D]@[D, D] under the production dtype policy
    gf_proj = 2 * BATCH * seq * width * width
    dt = chain_time(lambda x, w: x @ w.astype(x.dtype), tokens, wq)
    report(f"proj GEMM [{BATCH*seq},{width}]@[{width},{width}]", dt, gf_proj)
    gf_fc = 2 * BATCH * seq * width * 4 * width
    dt = chain_time(lambda x, w: x @ w.astype(x.dtype), tokens, wfc)
    report("c_fc GEMM (D->4D)", dt, gf_fc)
    dt = chain_time(lambda x, w: x @ w.astype(x.dtype), hidden, wpr)
    report("c_proj GEMM (4D->D)", dt, gf_fc)

    from debiasing_multi_modal_tpu.models.layers import (
        LayerNormF32, MLPBlock, MultiHeadAttentionBlock, ResidualAttentionBlock,
    )

    def timed_module(mod, x, label, flops=None, method=None):
        with jax.default_device(cpu):
            pv = jax.jit(mod.init, backend="cpu")(jax.random.PRNGKey(0), x[:1])
        pb, ps = pack_tree(jax.device_get(pv))
        pv = jax.jit(lambda b: unpack_tree(b, ps))(jnp.asarray(pb))
        dt = chain_time(lambda v, y: mod.apply(v, y), pv, x)
        report(label, dt, flops)
        return dt

    timed_module(
        LayerNormF32(), tokens, f"LayerNormF32 [B,{seq},{width}]"
    )
    gf_attn_block = 4 * gf_proj + 2 * 2 * BATCH * heads * seq * seq * 64
    timed_module(
        MultiHeadAttentionBlock(heads, dtype=jnp.bfloat16),
        tokens, "attn block (qkvo + sdpa)", gf_attn_block,
    )
    timed_module(
        MLPBlock(dtype=jnp.bfloat16), tokens, "mlp block (fc+gelu+proj)",
        2 * gf_fc,
    )
    gf_res = gf_attn_block + 2 * gf_fc
    timed_module(
        ResidualAttentionBlock(heads, dtype=jnp.bfloat16),
        tokens, "full residual block (2 LN + both)", gf_res,
    )

    # --- cumulative transformer prefixes ----------------------------------
    import flax.linen as nn

    from debiasing_multi_modal_tpu.models.layers import Transformer

    for depth in (1, 4, 12):
        mod = Transformer(width, depth, heads, dtype=jnp.bfloat16)
        timed_module(mod, tokens, f"transformer depth {depth}", gf_res * depth)

    # --- full encode and full step -----------------------------------------
    enc = lambda v, x: model.apply(v, x, method=model.encode_image)  # noqa: E731
    dt_vis = chain_time(enc, variables, x224)
    report("full visual (224 in)", dt_vis, BATCH * VIT_GF_PER_IMG)

    def full_step(v, im, t):
        x = preprocess_uint8(im, 224, dtype=jnp.bfloat16)
        f = model.apply(v, x, method=model.encode_image).astype(jnp.float32)
        nrm = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        w = t / jnp.linalg.norm(t, axis=0, keepdims=True)
        return jnp.matmul(nrm, w, precision=jax.lax.Precision.HIGHEST)

    dt = chain_time(full_step, variables, images, text)
    report("full step (preproc+enc+zs)", dt, BATCH * VIT_GF_PER_IMG)
    print(f"\nimgs/sec at full step: {BATCH / dt:,.0f}")
    print("\n".join(["--- summary ---"] + rows))


if __name__ == "__main__":
    main()
