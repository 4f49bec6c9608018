#!/usr/bin/env python
"""Full-model check of the >= 1024-token auto-dispatch boundary.

ViT-L/14 at 448px input has S = (448/14)^2 + 1 = 1025 tokens — a REAL
encoder inside the auto-dispatch's Pallas regime (docs/STATUS.md round-3
candidate 6: the boundary rested on synthetic-layer wins).  Measures the
full encode with impl forced both ways; "auto" follows whichever wins.

    python scripts/profile_vitl_448.py [batches...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.models.clip import get_config
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

enable_persistent_cache()

RES = 448


def main():
    batches = [int(a) for a in sys.argv[1:]] or [32]
    print("backend:", jax.default_backend())

    # ViT-L/14 tower at 448px: positional embedding sized by the input grid
    cfg = get_config("ViT-L/14@336px", dtype=jnp.bfloat16)

    model0 = create_clip(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model0.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, RES, RES, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    rng = np.random.default_rng(0)
    for bs in batches:
        x = jnp.asarray(
            rng.standard_normal((bs, RES, RES, 3)).astype(np.float32),
            jnp.bfloat16,
        )
        for impl in ("xla", "pallas"):
            model = create_clip(cfg, attn_impl=impl)
            enc = lambda v, im: model.apply(v, im, method=model.encode_image)  # noqa: E731
            try:
                dt = chain_time(enc, variables, x, iters=6) / 1e3
            except Exception as e:
                print(f"bs={bs:4d} {impl:7s} FAILED: {type(e).__name__}: {e}"[:160],
                      flush=True)
                continue
            print(
                f"bs={bs:4d} {impl:7s} encode {dt*1e3:9.1f} ms  "
                f"{bs/dt:7.1f} imgs/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
