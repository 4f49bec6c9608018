"""Ulysses sequence parallelism (ops/ulysses_attention.py) on the 8-device
mesh.

The second SP flavor (SURVEY.md §2.9 names Ulysses among the strategies the
reference lacks): all-to-all scatters heads / gathers sequence, ordinary
attention runs locally on full S for a head subset, reverse all-to-all.
Because the exchange is a pure permutation the result must be EXACT against
the XLA oracle (no softmax-merge tolerance), gradients included.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.attention import _xla_attention
from debiasing_multi_modal_tpu.ops.ulysses_attention import (
    ulysses_sequence_parallel_attention,
)
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.standard_normal((2, 64, 8, 16)), jnp.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_oracle(qkv, causal):
    q, k, v = qkv
    mesh = make_mesh((8,), ("data",))
    out = ulysses_sequence_parallel_attention(
        q, k, v, mesh=mesh, axis_name="data", causal=causal
    )
    ref = _xla_attention(q, k, v, causal=causal)
    # BITWISE: the exchange is a pure permutation and the local math is the
    # oracle's own — the docs' exactness claim is enforced here, so if a
    # backend/compiler change ever breaks it this test flags the doc too
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ulysses_dp_sp_mesh(qkv):
    q, k, v = qkv
    mesh = make_mesh((2, 4), ("b", "s"))
    out = ulysses_sequence_parallel_attention(
        q, k, v, mesh=mesh, axis_name="s", causal=True, batch_axis="b"
    )
    ref = _xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_gradients_match_oracle(qkv):
    q, k, v = qkv
    mesh = make_mesh((8,), ("data",))
    rng = np.random.default_rng(1)
    tgt = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_u(q):
        o = ulysses_sequence_parallel_attention(
            q, k, v, mesh=mesh, axis_name="data", causal=True
        )
        return jnp.mean((o - tgt) ** 2)

    def loss_ref(q):
        return jnp.mean((_xla_attention(q, k, v, causal=True) - tgt) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_u)(q)),
        np.asarray(jax.grad(loss_ref)(q)),
        atol=2e-5,
    )


def test_ulysses_validation(qkv):
    q, k, v = qkv
    mesh = make_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="sequence"):
        ulysses_sequence_parallel_attention(
            q[:, :63], k[:, :63], v[:, :63], mesh=mesh, axis_name="data"
        )
    with pytest.raises(ValueError, match="heads"):
        ulysses_sequence_parallel_attention(
            q[:, :, :4], k[:, :, :4], v[:, :, :4], mesh=mesh, axis_name="data"
        )
    with pytest.raises(ValueError, match="self-attention"):
        ulysses_sequence_parallel_attention(
            q[0], k[0], v[0], mesh=mesh, axis_name="data"
        )
