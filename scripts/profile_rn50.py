#!/usr/bin/env python
"""Stage-level time breakdown of the RN50 extraction step on the TPU.

Times truncated forward prefixes (preprocess / stem / body stages /
attnpool / zs head) as separate chained-accumulator programs, plus large
GEMMs as the chip's practical peak, to locate MXU-utilization gaps
(docs/DESIGN.md §8.5).  FLOP figures use XLA cost analysis (11.4 GF/img).

    python scripts/profile_rn50.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.utils.timing import (
    chain_time as _chain_time_ms,
)
import numpy as np

from debiasing_multi_modal_tpu.models import create_clip
from debiasing_multi_modal_tpu.ops.preprocess import preprocess_uint8
from debiasing_multi_modal_tpu.parallel.packing import pack_tree, unpack_tree

BATCH = 512
RES_IN = 256
ITERS = 16


def chain_time(fn, *args):
    """Mean seconds per call — the shared accumulator-chain
    harness (utils/timing.py), so the measured-barrier policy has
    exactly one implementation across every perf script."""
    return _chain_time_ms(fn, *args, iters=ITERS) / 1e3


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    print("backend:", jax.default_backend())
    model = create_clip("RN50", dtype=jnp.bfloat16)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_vars = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            jnp.zeros((1, 77), jnp.int32),
        )
    buf, spec = pack_tree(jax.device_get(host_vars))
    variables = jax.jit(lambda b: unpack_tree(b, spec))(jnp.asarray(buf))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        (rng.random((BATCH, RES_IN, RES_IN, 3)) * 255).astype(np.uint8)
    )
    x224 = jax.jit(lambda im: preprocess_uint8(im, 224, dtype=jnp.bfloat16))(images)
    text = jnp.asarray(rng.standard_normal((1024, 2)).astype(np.float32))

    # truncated applies via flax's filtered call: run the visual tower but
    # stop at a named intermediate using capture_intermediates + a wrapper is
    # timing-hostile; instead rebuild prefix modules with the same shapes.
    import flax.linen as nn

    from debiasing_multi_modal_tpu.models.resnet import (
        AttentionPool2d, Bottleneck, ModifiedResNet, _avg_pool,
        InferenceBatchNorm,
    )

    class Prefix(nn.Module):
        n_stages: int  # 0 = stem only
        layers = (3, 4, 6, 3)
        width = 64

        @nn.compact
        def __call__(self, x):
            conv = lambda f, k, s, n: nn.Conv(  # noqa: E731
                f, (k, k), strides=(s, s), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=jnp.bfloat16, name=n,
            )
            bn = lambda f, n: InferenceBatchNorm(f, name=n)  # noqa: E731
            x = nn.relu(bn(32, "bn1")(conv(32, 3, 2, "conv1")(x)))
            x = nn.relu(bn(32, "bn2")(conv(32, 3, 1, "conv2")(x)))
            x = nn.relu(bn(64, "bn3")(conv(64, 3, 1, "conv3")(x)))
            x = _avg_pool(x, 2)
            for stage in range(1, self.n_stages + 1):
                planes = self.width * (1, 2, 4, 8)[stage - 1]
                for block in range(self.layers[stage - 1]):
                    x = Bottleneck(
                        planes, stride=2 if (block == 0 and stage > 1) else 1,
                        dtype=jnp.bfloat16, name=f"layer{stage}_{block}",
                    )(x)
            return x

    rows = []

    def report(name, dt, flops=None):
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        rows.append(f"{name:28s} {dt * 1e3:8.2f} ms{tf}")
        print(rows[-1], flush=True)

    # practical peak: big GEMM under several dtype regimes (this chip's XLA
    # build has shown dtype-dependent algorithm choices — f32 params + bf16
    # compute beat all-bf16 convs 2.3x in round 1)
    m16 = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
    m32 = m16.astype(jnp.float32)
    gf = 2 * 8192 ** 3
    dt = chain_time(lambda a, b: a @ b, m16, m16)
    report("GEMM 8192^3 bf16@bf16", dt, gf)
    dt = chain_time(
        lambda a, b: jax.lax.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        m32, m32,
    )
    report("GEMM f32->bf16 (pref f32)", dt, gf)
    dt = chain_time(
        lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.DEFAULT),
        m32, m32,
    )
    report("GEMM f32 DEFAULT", dt, gf)

    dt = chain_time(lambda im: preprocess_uint8(im, 224, dtype=jnp.bfloat16), images)
    report("preprocess 256->224", dt)

    key = jax.random.PRNGKey(0)
    for n_stages, label in ((0, "stem+pool"), (1, "+layer1"), (2, "+layer2"),
                            (3, "+layer3"), (4, "+layer4")):
        mod = Prefix(n_stages=n_stages)
        with jax.default_device(cpu):
            pv = jax.jit(mod.init, backend="cpu")(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
        pb, ps = pack_tree(jax.device_get(pv))
        pv = jax.jit(lambda b: unpack_tree(b, ps))(jnp.asarray(pb))
        dt = chain_time(lambda v, x: mod.apply(v, x), pv, x224)
        report(f"{label} (cum)", dt)

    # full visual tower and the complete step
    enc = lambda v, x: model.apply(v, x, method=model.encode_image)  # noqa: E731
    dt_vis = chain_time(enc, variables, x224)
    report("full visual (224 in)", dt_vis, BATCH * 11.4e9)

    def full_step(v, im, t):
        x = preprocess_uint8(im, 224, dtype=jnp.bfloat16)
        f = model.apply(v, x, method=model.encode_image).astype(jnp.float32)
        nrm = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        w = t / jnp.linalg.norm(t, axis=0, keepdims=True)
        return jnp.matmul(nrm, w, precision=jax.lax.Precision.HIGHEST)

    dt = chain_time(full_step, variables, images, text)
    report("full step (preproc+enc+zs)", dt, BATCH * 11.4e9)
    print(f"\nimgs/sec at full step: {BATCH / dt:,.0f}")
    print("\n".join(["--- summary ---"] + rows))


if __name__ == "__main__":
    main()
