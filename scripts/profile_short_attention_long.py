#!/usr/bin/env python
"""Does the short-S merged-layout kernel's win extend past S=256?

DESIGN §8.8 measured the kernel 1.32x on ViT-B/32 (S=50) and gated auto at
MAX_SEQ_LEN=256.  This probe force-raises the gate and measures the FULL
visual encode (§5's iron rule) for the ViT-L family:

- ViT-L/14        S=257, D=1024, 16 heads (~3.3 MB/img cell -> gb=1)
- ViT-L/14@336px  S=577, D=1024, 16 heads (~8.6 MB/img cell -> gb=1,
  close to the Mosaic scoped-VMEM limit; an OOM here is itself the datum)
- ViT-L/14@448px  S=1025 (whole-row cell ~20 MB -> q-tiled mode, bq=256)

    python scripts/profile_short_attention_long.py [BATCH=256]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.ops import short_attention as sa
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree
from debiasing_multi_modal_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)
from debiasing_multi_modal_tpu.utils.timing import chain_time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
PEAK_TF = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
# bench.py's GFLOPs/img accounting for the two probes
GF = {"ViT-L/14": 162.0, "ViT-L/14@336px": 383.0}

enable_persistent_cache()
sa.MAX_SEQ_LEN = max(sa.MAX_SEQ_LEN, 1024)  # probe ran pre-gate-raise


def stage_params(model, res=None):
    cpu = jax.devices("cpu")[0]
    res = res or model.config.image_resolution
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, res, res, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    return jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))


def main():
    from debiasing_multi_modal_tpu.models.clip import get_config

    print(f"backend: {jax.default_backend()}  batch: {BATCH}")
    GF["ViT-L/14@448px"] = 708.0  # 383 GF * (1025/577) token scaling, approx
    cases = [
        ("ViT-L/14", BATCH, None),
        ("ViT-L/14@336px", max(32, BATCH // 4), None),
        ("ViT-L/14@448px", max(16, BATCH // 8), 448),
    ]
    for name, bs, res_override in cases:
        cfg_name = "ViT-L/14@336px" if res_override else name
        variables = None
        for impl in ("xla", "short"):
            cfg = get_config(cfg_name, dtype=jnp.bfloat16)
            model = create_clip(cfg, attn_impl=impl)
            if variables is None:
                variables = stage_params(model, res_override)
            res = res_override or model.config.image_resolution
            images = jax.random.normal(
                jax.random.PRNGKey(2), (bs, res, res, 3), jnp.bfloat16
            )
            try:
                ms = chain_time(
                    lambda v, im, m=model: m.apply(v, im, method=m.encode_image),
                    variables, images, iters=8,
                )
            except Exception as e:  # Mosaic VMEM OOM is a legitimate datum
                print(f"{name:16s} [{impl}]  FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}")
                continue
            ips = bs / ms * 1e3
            mfu = ips * GF[name] / 1e3 / PEAK_TF
            print(f"{name:16s} [{impl}]  bs{bs}  {ms:9.2f} ms  "
                  f"{ips:8.1f} imgs/s  MFU {mfu:.3f}")
    print("done")


if __name__ == "__main__":
    main()
