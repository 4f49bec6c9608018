#!/usr/bin/env python
"""Measure XLA vs Pallas attention on ASYMMETRIC (cross-attention) shapes.

Closes the last unmeasured dispatch regime (docs/STATUS.md known-gap 5):
`ops/flash_attention.supported` keeps any shape with min(Sq, Skv) < 1024 on
XLA because every measurement behind the policy was self-attention.  This
script probes long-query/short-kv and short-query/long-kv shapes, the
auto-dispatch boundary on asymmetric shapes past the score-bytes threshold,
and the prohibitive regime where the XLA path's [B, H, Sq, Skv] logits no
longer fit.

Reference analog: the CLIP towers are pure self-attention
(clip/model.py:175-187); cross-attention enters only through this
framework's generalized kernel surface (q/k/v with distinct sequence
lengths), so this table is a forward-looking dispatch validation, not a
reference-parity measurement.

Timing follows the tunnel rules (memory/axon notes): CHAIN data-dependent
calls inside one jitted program, one scalar fetch as the barrier.

    python scripts/bench_cross_attention.py            # on the TPU
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
    flash_attention, supported,
)
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

CHAIN = 8
H, D = 8, 64

# (label, B, Sq, Skv) — score_GiB = B*H*Sq*Skv*2 / 2^30 (bf16 logits)
CONFIGS = [
    ("q4k/kv256  bs16", 16, 4096, 256),    # 0.25 GiB  long-q / short-kv
    ("q4k/kv256  bs64", 64, 4096, 256),    # 1.0 GiB
    ("q256/kv4k  bs16", 16, 256, 4096),    # 0.25 GiB  short-q / long-kv
    ("q1k/kv77   bs256", 256, 1024, 77),   # CLIP-text-sized kv stream
    ("q8k/kv1k   bs32", 32, 8192, 1024),   # 4.0 GiB   asymmetric, sub-threshold
    ("q8k/kv2k   bs48", 48, 8192, 2048),   # 12 GiB    prohibitive: auto -> pallas
]


def timed(fn, q, k, v, iters=3):
    @jax.jit
    def chained(q, k, v):
        acc = jnp.float32(0.0)
        x = q
        for _ in range(CHAIN):
            o = fn(x, k, v)
            acc = acc + o.astype(jnp.float32).mean()
            x = q + 1e-6 * o.astype(q.dtype)
        return acc

    float(chained(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = acc + chained(q, k, v)
    float(acc)
    return (time.perf_counter() - t0) / (iters * CHAIN)


def main():
    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")
    rng = np.random.default_rng(0)
    rows = []
    for label, b, sq, skv in CONFIGS:
        q = jnp.asarray(rng.standard_normal((b, sq, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, skv, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, skv, H, D)), jnp.bfloat16)
        gib = b * H * sq * skv * 2 / (1 << 30)
        auto = "pallas" if supported(q, k, v) else "xla"

        t_xla = t_pal = None
        try:
            t_xla = timed(
                lambda q, k, v: dot_product_attention(q, k, v, impl="xla"),
                q, k, v,
            )
        except Exception as e:  # XLA materializes [B,H,Sq,Skv]: OOM at scale
            print(f"  xla failed for {label}: {type(e).__name__}")
        try:
            t_pal = timed(lambda q, k, v: flash_attention(q, k, v), q, k, v)
        except Exception as e:
            print(f"  pallas failed for {label}: {type(e).__name__}")

        fmt = lambda t: f"{t * 1e3:8.2f} ms" if t else "     OOM/ERR"
        ratio = f"{t_xla / t_pal:5.2f}x" if t_xla and t_pal else "    -"
        rows.append(
            f"{label:18s} score={gib:5.2f}GiB auto={auto:6s} "
            f"xla {fmt(t_xla)}  pallas {fmt(t_pal)}  pallas_speedup {ratio}"
        )
        print(rows[-1], flush=True)
    print("\n".join(["--- summary ---"] + rows))


if __name__ == "__main__":
    main()
