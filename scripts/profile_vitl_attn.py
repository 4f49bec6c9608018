#!/usr/bin/env python
"""XLA vs Pallas attention for the ViT-L/14@336px encoder, in context.

S=577 sits below the auto-dispatch's MIN_AUTO_SEQ_LEN, so the production
path materializes the bf16 score tensor (5.45 GB/layer at bs512).  This
measures whether the blockwise kernel wins in-context at that depth, across
batch sizes — the dispatch policy only changes on in-context numbers.

    python scripts/profile_vitl_attn.py [batches...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.timing import chain_time

GF_PER_IMG = 383.4e9  # XLA cost_analysis at 336px (the 224px figure is 164)


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    batches = [int(a) for a in sys.argv[1:]] or [512, 128]
    print("backend:", jax.default_backend())

    # init once (host CPU), reuse the packed buffer for both impls
    model0 = create_clip("ViT-L/14@336px", dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model0.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 336, 336, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    rng = np.random.default_rng(0)
    for bs in batches:
        x = jnp.asarray(
            rng.standard_normal((bs, 336, 336, 3)).astype(np.float32),
            jnp.bfloat16,
        )
        for impl in ("xla", "pallas"):
            model = create_clip("ViT-L/14@336px", dtype=jnp.bfloat16, attn_impl=impl)
            enc = lambda v, im: model.apply(v, im, method=model.encode_image)  # noqa: E731
            try:
                dt = chain_time(enc, variables, x, iters=6) / 1e3
            except Exception as e:
                print(f"bs={bs:4d} {impl:7s} FAILED: {type(e).__name__}: {e}"[:160],
                      flush=True)
                continue
            print(
                f"bs={bs:4d} {impl:7s} encode {dt*1e3:9.1f} ms  "
                f"{bs/dt:7.1f} imgs/s  {bs*GF_PER_IMG/dt/1e12:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
