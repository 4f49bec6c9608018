"""Ring (sequence-parallel) attention vs the XLA oracle on the 8-device
CPU mesh — the pod-scale long-context capability (SURVEY §5.7/§2.9: the
reference has no distributed construct; this is the TPU-native extension).

Checks: exact-causal and non-causal parity with sequence sharded 8 ways,
gradient parity through the scan+ppermute recurrence, collective shape
(ppermute only — no all-gather of kv), and the wrapper's validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debiasing_multi_modal_tpu.ops.attention import _xla_attention
from debiasing_multi_modal_tpu.ops.ring_attention import (
    sequence_parallel_attention,
)


def _mesh():
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), ("sp",))


def _qkv(b, s, h, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
        for _ in range(3)
    )


@pytest.mark.parametrize("causal", [False, True])
def test_matches_xla_oracle(causal):
    mesh = _mesh()
    q, k, v = _qkv(2, 64, 2, 32, seed=1)
    out = sequence_parallel_attention(
        q, k, v, mesh=mesh, axis_name="sp", causal=causal
    )
    ref = _xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kv_rotates_no_allgather():
    """The ring must move kv by neighbor ppermute, never all-gather it."""
    mesh = _mesh()
    q, k, v = _qkv(1, 32, 2, 32, seed=2)
    f = jax.jit(
        lambda q, k, v: sequence_parallel_attention(
            q, k, v, mesh=mesh, axis_name="sp", causal=True
        )
    )
    txt = f.lower(q, k, v).compile().as_text()
    assert "all-gather" not in txt
    assert "collective-permute" in txt


def test_gradients_match_xla():
    mesh = _mesh()
    q, k, v = _qkv(1, 64, 2, 32, seed=3)

    def loss_ring(q, k, v):
        out = sequence_parallel_attention(
            q, k, v, mesh=mesh, axis_name="sp", causal=True
        )
        return (out ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, causal=True) ** 2).sum()

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_inputs_close():
    mesh = _mesh()
    q, k, v = _qkv(2, 64, 2, 32, seed=4)
    out = sequence_parallel_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), mesh=mesh, axis_name="sp",
    ).astype(jnp.float32)
    ref = _xla_attention(q, k, v)
    out, ref = np.asarray(out), np.asarray(ref)
    cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.999


def test_validation():
    mesh = _mesh()
    q, k, v = _qkv(1, 60, 2, 32)  # 60 not divisible by 8
    with pytest.raises(ValueError):
        sequence_parallel_attention(q, k, v, mesh=mesh, axis_name="sp")
    with pytest.raises(ValueError):
        sequence_parallel_attention(
            q[:, :, 0], k[:, :, 0], v[:, :, 0], mesh=mesh, axis_name="sp"
        )


def test_dp_x_sp_mesh():
    """Batch sharded over dp AND sequence over sp in one 2x4 mesh — the
    pod layout: each dp slice runs its own 4-hop ring."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "sp"))
    q, k, v = _qkv(4, 32, 2, 32, seed=5)
    out = sequence_parallel_attention(
        q, k, v, mesh=mesh, axis_name="sp", causal=True, batch_axis="dp"
    )
    ref = _xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
