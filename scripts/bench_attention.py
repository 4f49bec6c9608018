#!/usr/bin/env python
"""Measure Pallas flash attention vs XLA attention across sequence lengths.

Feeds the measured table in docs/DESIGN.md §5 (VERDICT r1 item 7).  Each
timing chains CHAIN kernel calls inside ONE jitted program with a data
dependency (the tunnel's per-dispatch floor is ~9 ms, so single-call
microbenchmarks are meaningless here — see memory/axon notes) and fetches a
scalar once as the barrier.

    python scripts/bench_attention.py            # on the TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.ops.attention import dot_product_attention
from debiasing_multi_modal_tpu.ops.flash_attention import (
    _heads_per_cell, flash_attention,
)

CHAIN = 8

# (label, B, S, H, D)
CONFIGS = [
    ("ViT-B/32 enc  (bs512)", 512, 50, 12, 64),
    ("ViT-L/14@336  (bs64)", 64, 257, 16, 64),
    ("1k ctx        (bs16)", 16, 1024, 8, 64),
    ("4k ctx        (bs4)", 4, 4096, 8, 64),
    ("4k ctx        (bs16)", 16, 4096, 8, 64),
]


def timed(fn, q, k, v, iters=3):
    @jax.jit
    def chained(q, k, v):
        acc = jnp.float32(0.0)
        x = q
        for _ in range(CHAIN):
            o = fn(x, k, v)
            acc = acc + o.astype(jnp.float32).mean()
            x = q + 1e-6 * o.astype(q.dtype)  # data dependency between calls
        return acc

    float(chained(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = acc + chained(q, k, v)
    float(acc)
    return (time.perf_counter() - t0) / (iters * CHAIN)


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")
    rng = np.random.default_rng(0)
    rows = []
    for label, b, s, h, d in CONFIGS:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        g = _heads_per_cell(b * h, -(-s // 128) * 128, d)

        try:
            t_xla = timed(
                lambda q, k, v: dot_product_attention(q, k, v, impl="xla"), q, k, v
            )
        except Exception as e:  # XLA materializes [B,H,S,S]: OOM at scale
            t_xla = None
            print(f"  xla failed for {label}: {type(e).__name__}")
        try:
            t_pal = timed(
                lambda q, k, v: flash_attention(q, k, v), q, k, v
            )
        except Exception as e:
            t_pal = None
            print(f"  pallas failed for {label}: {type(e).__name__}")

        fmt = lambda t: f"{t * 1e3:8.2f} ms" if t else "     OOM/ERR"
        ratio = (
            f"{t_xla / t_pal:5.2f}x" if t_xla and t_pal else "    -"
        )
        rows.append(
            f"{label:22s} S={s:<5d} pack={g:<3d} xla {fmt(t_xla)}  "
            f"pallas {fmt(t_pal)}  pallas_speedup {ratio}"
        )
        print(rows[-1], flush=True)
    print("\n".join(["--- summary ---"] + rows))


if __name__ == "__main__":
    main()
