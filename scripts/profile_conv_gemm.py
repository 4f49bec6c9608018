#!/usr/bin/env python
"""Measure the implicit-GEMM fused bottleneck vs XLA at RN50 layer shapes.

    python scripts/profile_conv_gemm.py [batch]

Targets DESIGN §8's remaining headroom: layer1 (55% of its lane-occupancy
ceiling) and layer2 (49%).  Prints ms per block for the Pallas implicit-GEMM
kernel (over strip_rows / images_per_cell variants) against the XLA conv
formulation of the same folded-BN block, accumulator-chained (naive timings
are wrong over the tunnel — utils/timing.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.ops.conv_gemm import (
    fused_bottleneck_gemm,
    xla_bottleneck,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

# (name, H, Cin, M, Cout, downsample)
SHAPES = [
    ("l1b0_ds", 56, 64, 64, 256, True),
    ("l1b1", 56, 256, 64, 256, False),
    ("l2b1", 28, 512, 128, 512, False),
]


def main():
    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    only = os.environ.get("CONV_GEMM_BLOCKS")  # comma-sep block-name filter
    strips = tuple(
        int(s) for s in os.environ.get("CONV_GEMM_STRIPS", "8,14,28").split(",")
    )
    gs = tuple(int(s) for s in os.environ.get("CONV_GEMM_G", "1,2").split(","))
    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.default_rng(0)

    for name, h, cin, m, cout, ds in SHAPES:
        if only and name not in only.split(","):
            continue
        x = jnp.asarray(
            rng.standard_normal((batch, h, h, cin)).astype(np.float32)
        ).astype(dt)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            (rng.standard_normal(s) * 0.05).astype(np.float32)
        )
        w1, b1 = mk(cin, m), mk(m)
        w2, b2 = mk(3, 3, m, m), mk(m)
        w3, b3 = mk(m, cout), mk(cout)
        wd, bd = (mk(cin, cout), mk(cout)) if ds else (None, None)

        xla_ms = chain_time(
            lambda x_: xla_bottleneck(x_, w1, b1, w2, b2, w3, b3, wd, bd), x
        )
        row = {"block": name, "batch": batch, "xla_ms": round(xla_ms, 2)}
        for strip in strips:
            if h % strip:
                continue
            for g in gs:
                if batch % g:
                    continue
                try:
                    ms = chain_time(
                        lambda x_: fused_bottleneck_gemm(
                            x_, w1, b1, w2, b2, w3, b3, wd, bd,
                            strip_rows=strip, images_per_cell=g,
                        ),
                        x,
                    )
                    row[f"pallas_s{strip}_g{g}_ms"] = round(ms, 2)
                except Exception as e:  # VMEM OOM etc — record, keep going
                    row[f"pallas_s{strip}_g{g}_ms"] = f"ERR:{type(e).__name__}"
        print(json.dumps(row))


if __name__ == "__main__":
    main()
