#!/usr/bin/env python
"""Param-dtype probe: fp32 weights + bf16 compute vs ALL-bf16 weights.

The numerics policy (docs/DESIGN.md §2) keeps parameters fp32 because on
v5e convs that measured ~2.3x FASTER than all-bf16 (XLA picks a better conv
algorithm) — but that was measured on RN50, whose FLOPs are convs.  ViT
towers are pure matmuls, where bf16 weights halve weight HBM traffic with no
conv-algorithm cliff; this probe measures whether the policy also holds for
ViTs, per backbone, in ONE process (one tunnel claim, weights cast on
device — no second upload).  Reference hot path being modeled:
/root/reference/clip_inference.py:202-257 extraction loop.

    python scripts/probe_param_dtype.py [BACKBONE ...]   # default ViT-B/32

Timing uses the chained-accumulator pattern (naive timings are wrong over
the axon tunnel — CLAUDE.md).  The two dtype variants are distinct jit
programs (dtype is part of the aval), so there is no patched-global cache
trap (memory: jit-cache-measurement-trap).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner
from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
from debiasing_multi_modal_tpu.parallel.packing import packed_host_init
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

ITERS = 16
# per-backbone (batch, input resolution): bench.py's measured-best batches
SHAPES = {
    "RN50": (512, 256),
    "ViT-B/32": (1024, 256),
    "ViT-L/14@336px": (256, 368),
}


def time_step(runner, variables, images_dev, iters=ITERS):
    @jax.jit
    def prog(variables, zs, images, acc):
        emb, preds = runner._step(variables, zs, images)
        return acc + emb.astype(jnp.float32).mean() + preds.sum().astype(jnp.float32)

    acc = jnp.float32(0.0)
    for _ in range(2):
        acc = prog(variables, runner.zs_weights, images_dev, acc)
    float(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = prog(variables, runner.zs_weights, images_dev, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def probe(backbone):
    batch, res_in = SHAPES.get(backbone, (512, 256))
    model = create_clip(backbone, dtype=jnp.bfloat16)
    variables_f32 = packed_host_init(model)
    # cast on device — one tiny program, no second host->device upload
    variables_bf16 = jax.jit(
        lambda v: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            v,
        )
    )(variables_f32)
    text = np.random.default_rng(0).standard_normal(
        (2, model.config.embed_dim)
    ).astype(np.float32)
    runner = ExtractionRunner(
        model, variables_f32, text, mesh=make_mesh((len(jax.devices()),))
    )
    rng = np.random.default_rng(0)
    images_dev = jnp.asarray(
        (rng.random((batch, res_in, res_in, 3)) * 255).astype(np.uint8)
    )

    dt_f32 = time_step(runner, variables_f32, images_dev)
    dt_bf16 = time_step(runner, variables_bf16, images_dev)
    # re-run fp32 to bound drift (tunnel wall-clock variance — re-measure
    # before believing a surprise)
    dt_f32b = time_step(runner, variables_f32, images_dev)
    print(
        f"{backbone:>16}  bs{batch:<5} f32-params {dt_f32*1e3:7.2f} ms "
        f"(recheck {dt_f32b*1e3:7.2f})  bf16-params {dt_bf16*1e3:7.2f} ms  "
        f"bf16/f32 speedup {min(dt_f32, dt_f32b) / dt_bf16:5.2f}x  "
        f"[{batch/min(dt_f32, dt_f32b):,.0f} vs {batch/dt_bf16:,.0f} imgs/s]",
        flush=True,
    )


def main():
    enable_persistent_cache()
    backbones = sys.argv[1:] or ["ViT-B/32"]
    print("backend:", jax.default_backend(), flush=True)
    for backbone in backbones:
        probe(backbone)


if __name__ == "__main__":
    main()
