"""Implicit-GEMM fused bottleneck (ops/conv_gemm.py) numerics.

Pinned against the XLA conv formulation of the same folded-BN block
(reference Bottleneck semantics, clip/model.py:10-55) in interpret mode on
the CPU mesh — the on-chip perf comparison lives in
scripts/profile_conv_gemm.py and its outcome in docs/DESIGN.md §8.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.conv_gemm import (
    fused_bottleneck_gemm,
    xla_bottleneck,
)


def _weights(rng, cin, m, cout, ds):
    mk = lambda *s: jnp.asarray(  # noqa: E731
        (rng.standard_normal(s) * 0.1).astype(np.float32)
    )
    w = dict(
        w1=mk(cin, m), b1=mk(m), w2=mk(3, 3, m, m), b2=mk(m),
        w3=mk(m, cout), b3=mk(cout),
    )
    if ds:
        w.update(wd=mk(cin, cout), bd=mk(cout))
    return w


@pytest.mark.parametrize(
    "cin,m,cout,ds,strip,g",
    [
        (64, 16, 64, False, 8, 1),     # equal-channel interior block
        (64, 16, 128, True, 4, 2),     # downsample block, image packing
        (32, 16, 64, True, 16, 1),     # whole image as one strip
    ],
    ids=["plain", "ds_packed", "one_strip"],
)
def test_matches_xla_formulation(rng, cin, m, cout, ds, strip, g):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)).astype(np.float32))
    w = _weights(rng, cin, m, cout, ds)
    ref = xla_bottleneck(x, **w)
    out = fused_bottleneck_gemm(
        x, **w, strip_rows=strip, images_per_cell=g, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_rejects_channel_mismatch_without_downsample(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)).astype(np.float32))
    w = _weights(rng, 32, 8, 64, False)
    with pytest.raises(AssertionError):
        fused_bottleneck_gemm(x, **w, strip_rows=8, interpret=True)
