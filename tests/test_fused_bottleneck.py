"""Fused Pallas bottleneck kernel == the XLA conv formulation (interpret
mode on CPU; the real-chip speed comparison lives in scripts/ + DESIGN §8.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.fused_bottleneck import fused_bottleneck

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def xla_block(x, w1, b1, w2, b2, w3, b3):
    conv = lambda x, k: jax.lax.conv_general_dilated(  # noqa: E731
        x, k, (1, 1), "SAME", dimension_numbers=DN
    )
    y = jax.nn.relu(conv(x, w1[None, None]) + b1)
    y = jax.nn.relu(conv(y, w2) + b2)
    y = conv(y, w3[None, None]) + b3
    return jax.nn.relu(y + x)


@pytest.mark.parametrize("shape", [(2, 8, 8, 32, 8), (1, 14, 14, 64, 16)],
                         ids=["tiny", "l3ish"])
def test_fused_matches_xla(rng, shape):
    b, h, w, c, m = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, m)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(m) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, m, m)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(m) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((m, c)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    ref = xla_block(x, w1, b1, w2, b2, w3, b3)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_matches_xla_bf16(rng):
    b, h, w, c, m = 2, 8, 8, 32, 8
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)  # noqa: E731
    x, w1, b1 = mk(b, h, w, c), mk(c, m), mk(m)
    w2, b2, w3, b3 = mk(3, 3, m, m), mk(m), mk(m, c), mk(c)
    ref = xla_block(x, w1, b1, w2, b2, w3, b3)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
