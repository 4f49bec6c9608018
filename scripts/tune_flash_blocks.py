#!/usr/bin/env python
"""Block-size sweep for the Pallas flash-attention forward on TPU.

Block sizes are static parameters of flash_attention, so each configuration
traces and compiles its own kernel.  Compares against the XLA einsum path
at each shape (the auto-dispatch's competitor).  Feeds the block-size rows
of docs/DESIGN.md §5; _pick_blocks encodes the winning choices.

    python scripts/tune_flash_blocks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.ops import attention as xla_attn
from debiasing_multi_modal_tpu.ops import flash_attention as fa
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    shapes = [
        # (label, B, S, H, D)
        ("S=1024 bs16 8h", 16, 1024, 8, 64),
        ("S=2048 bs8 8h", 8, 2048, 8, 64),
        ("S=4096 bs4 8h", 4, 4096, 8, 64),
        ("S=4096 bs16 8h", 16, 4096, 8, 64),
    ]
    blocks = [(128, 128), (256, 128), (256, 256), (512, 256), (512, 512)]
    for label, b, s, h, d in shapes:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

        def xla(q):
            return xla_attn.dot_product_attention(q, q, q, impl="xla")

        try:
            t_x = chain_time(xla, q, iters=10)
            print(f"{label:18s} xla                 {t_x:8.2f} ms", flush=True)
        except Exception as e:  # OOM at the biggest shape
            print(f"{label:18s} xla                 FAILED {type(e).__name__}",
                  flush=True)
        for bq, bkv in blocks:
            if s % bq or s % bkv:
                continue

            def pallas(q, _bq=bq, _bkv=bkv):
                # block sizes are real (static) kernel parameters, so each
                # config traces and compiles its own kernel — an earlier
                # version patched module globals, which the jit cache
                # silently ignored after the first trace
                return fa.flash_attention(q, q, q, block_q=_bq, block_kv=_bkv)

            t_p = chain_time(pallas, q, iters=10)
            print(f"{label:18s} pallas bq{bq:<4d}bkv{bkv:<4d}{t_p:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
