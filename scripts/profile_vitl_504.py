#!/usr/bin/env python
"""Full-model point INSIDE the 1026..1536 q-tiled window (round 5).

``short_attention.MAX_SEQ_LEN = 1536`` routes 1025 < S <= 1536 to the
q-tiled kernel, but through round 4 the last full-model datum was S=1025
(ViT-L/14@448px) — the window's upper edge was an extrapolation, against
DESIGN §5's own rule that only full-model numbers set dispatch boundaries
(VERDICT r4 item 5).  ViT-L/14 at 504px input has S = (504/14)^2 + 1 =
1297 tokens, squarely inside the window; this measures the full encode
with the attention impl forced each way ("auto" follows the winner).
Reference scope: the ViT tower of /root/reference/clip/model.py:206-240
with the 336px positional embedding grid resized by the input.

    python scripts/profile_vitl_504.py [batches...]
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

RES = 504  # (504/14)^2 + 1 = 1297 tokens
GF_PER_IMG = 383.0 * (1297 / 577)  # token-scaled from the 336px figure, approx


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16]
    print(f"backend: {jax.default_backend()}  S = {(RES // 14) ** 2 + 1}")

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
        for impl in ("xla", "short", "pallas"):
            model = create_clip(cfg, attn_impl=impl)
            enc = lambda v, im: model.apply(v, im, method=model.encode_image)  # noqa: E731
            try:
                dt = chain_time(enc, variables, x, iters=6) / 1e3
            except Exception as e:
                print(f"bs={bs:4d} {impl:7s} FAILED: {type(e).__name__}: {e}"[:160],
                      flush=True)
                continue
            ips = bs / dt
            print(
                f"bs={bs:4d} {impl:7s} encode {dt*1e3:9.1f} ms  "
                f"{ips:7.1f} imgs/s  MFU {ips * GF_PER_IMG / 1e3 / 197:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
