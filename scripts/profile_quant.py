#!/usr/bin/env python
"""Measure the opt-in int8 W8A8 ViT path (ops/quant.py) against bf16 on-chip.

Times a single Dense GEMM at the production shape (bf16 vs W8A8), the full
visual encode, and the full extraction step (preprocess+encode+ZS) for both
modes, and reports the device-side embedding cosine between them — the number
that decides whether the mode is shippable, per the dispatch lesson of
docs/DESIGN.md §5: only full-model numbers count.

    python scripts/profile_quant.py [BACKBONE] [BATCH]   # default ViT-B/32 1024
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.ops.quant import int8_dense
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache
from debiasing_multi_modal_tpu.utils.timing import chain_time

BACKBONE = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/32"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ITERS = int(os.environ.get("QUANT_ITERS", "16"))
GF_PER_IMG = {"ViT-B/32": 9.1e9, "ViT-L/14@336px": 383e9, "ViT-L/14": 164e9}

enable_persistent_cache()


def main():
    from debiasing_multi_modal_tpu.ops.attention import _on_tpu

    on_tpu = _on_tpu()
    print("backend:", jax.default_backend(), " backbone:", BACKBONE, " batch:", BATCH)
    if not on_tpu:
        print("WARNING: CPU backend — Pallas rows run in INTERPRET mode; "
              "every timing below is a smoke check, not a TPU number")
    model = create_clip(BACKBONE, dtype=jnp.bfloat16)
    model_q = create_clip(BACKBONE, dtype=jnp.bfloat16, quant="int8")
    model_qp = create_clip(BACKBONE, dtype=jnp.bfloat16, quant="int8_pallas")
    cfg = model.config
    res = cfg.image_resolution

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, res, res, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    rng = np.random.default_rng(0)
    res_in = res + res // 8
    images = jnp.asarray(
        (rng.random((BATCH, res_in, res_in, 3)) * 255).astype(np.uint8)
    )
    text = jnp.asarray(rng.standard_normal((cfg.embed_dim, 2)).astype(np.float32))
    gf = GF_PER_IMG.get(BACKBONE)

    rows = []

    def report(name, dt_ms, flops=None):
        tf = f"  {flops / (dt_ms / 1e3) / 1e12:6.1f} TF/s" if flops else ""
        rows.append(f"{name:40s} {dt_ms:8.2f} ms{tf}")
        print(rows[-1], flush=True)

    # --- one Dense GEMM at the production hidden shape ---------------------
    width = cfg.vision_width
    seq = (res // cfg.vision_patch_size) ** 2 + 1
    x = jnp.asarray(
        rng.standard_normal((BATCH * seq, width)).astype(np.float32), jnp.bfloat16
    )
    w = jnp.asarray(rng.standard_normal((width, 4 * width)).astype(np.float32))
    gemm_flops = 2 * x.shape[0] * width * 4 * width
    report("c_fc GEMM bf16", chain_time(
        lambda a, b: a @ b.astype(a.dtype), x, w, iters=ITERS), gemm_flops)
    report("c_fc GEMM int8 (incl. dyn quant)", chain_time(
        lambda a, b: int8_dense(a, b), x, w, iters=ITERS), gemm_flops)
    report("c_fc GEMM int8 pallas (incl. quant)", chain_time(
        lambda a, b: int8_dense(a, b, impl="pallas"), x, w, iters=ITERS),
        gemm_flops)
    # raw kernel at explicit blocks (QUANT_BM/QUANT_BN env, static args —
    # patched globals are ignored after the first trace: memory note)
    from debiasing_multi_modal_tpu.ops.quant_gemm import int8_matmul
    from debiasing_multi_modal_tpu.ops.quant import (
        quantize_cols_int8, quantize_rows_int8,
    )

    bm = int(os.environ.get("QUANT_BM", "512"))
    bn = int(os.environ.get("QUANT_BN", "512"))
    qx2, sx2 = jax.jit(quantize_rows_int8)(x)
    qw2, sw2 = jax.jit(quantize_cols_int8)(w)
    report(f"pallas kernel only bm{bm} bn{bn}", chain_time(
        lambda a, b, c, d: int8_matmul(
            a, b, c, d, block_m=bm, block_n=bn, interpret=not on_tpu),
        qx2, qw2, sx2, sw2, iters=ITERS), gemm_flops)
    # pre-quantized operands: the pure int8-MXU rate, no quantize pass
    qx = jnp.asarray(rng.integers(-127, 128, size=x.shape), jnp.int8)
    qw = jnp.asarray(rng.integers(-127, 128, size=w.shape), jnp.int8)
    report("c_fc GEMM int8 (pre-quantized)", chain_time(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ), qx, qw, iters=ITERS), gemm_flops)

    # --- full visual encode -------------------------------------------------
    x_dev = jax.jit(lambda im: preprocess_uint8(im, res, dtype=jnp.bfloat16))(images)
    enc = lambda v, y: model.apply(v, y, method=model.encode_image)  # noqa: E731
    enc_q = lambda v, y: model_q.apply(v, y, method=model_q.encode_image)  # noqa: E731
    dt = chain_time(enc, variables, x_dev, iters=ITERS)
    report("full visual bf16", dt, BATCH * gf if gf else None)
    dt_q = chain_time(enc_q, variables, x_dev, iters=ITERS)
    report("full visual int8", dt_q, BATCH * gf if gf else None)
    enc_qp = lambda v, y: model_qp.apply(  # noqa: E731
        v, y, method=model_qp.encode_image)
    dt_qp = chain_time(enc_qp, variables, x_dev, iters=ITERS)
    report("full visual int8_pallas", dt_qp, BATCH * gf if gf else None)

    # --- embedding agreement (device) ---------------------------------------
    @jax.jit
    def cosine(v, y):
        a = enc(v, y).astype(jnp.float32)
        b = enc_q(v, y).astype(jnp.float32)
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return jnp.sum(a * b, axis=-1)

    cos = np.asarray(cosine(variables, x_dev))
    print(f"embedding cosine int8 vs bf16: min {cos.min():.5f} mean {cos.mean():.5f}")

    # --- full extraction step ------------------------------------------------
    def full_step(encode, v, im, t):
        y = preprocess_uint8(im, res, dtype=jnp.bfloat16)
        f = encode(v, y).astype(jnp.float32)
        nrm = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        zs = t / jnp.linalg.norm(t, axis=0, keepdims=True)
        return jnp.matmul(nrm, zs, precision=jax.lax.Precision.HIGHEST)

    for label, fn in (("bf16", enc), ("int8", enc_q), ("int8_pallas", enc_qp)):
        dt = chain_time(
            lambda v, im, t, fn=fn: full_step(fn, v, im, t),
            variables, images, text, iters=ITERS,
        )
        report(f"full step {label}", dt, BATCH * gf if gf else None)
        print(f"  imgs/sec ({label}): {BATCH / (dt / 1e3):,.0f}")

    print("\n".join(["--- summary ---"] + rows))


if __name__ == "__main__":
    main()
