"""Unit + parity tests for the short-S merged-layout attention kernel.

ops/short_attention.py is the round-4 answer to the ViT-B/32 MFU laggard
(docs/DESIGN.md §8.8): whole-sequence attention over the native [B, S, D]
layout, scores never leaving VMEM.  Reference semantics: torch
``nn.MultiheadAttention`` self-attention as used by
/root/reference/clip/model.py:171-192 (plus its causal text variant,
:328-334).  On CPU the kernel runs in Pallas interpret mode; the numerics
oracle is the plain XLA formulation.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debiasing_multi_modal_tpu.ops.attention import multi_head_attention
from debiasing_multi_modal_tpu.ops.short_attention import (
    MAX_SEQ_LEN,
    _xla_merged,
    pick_block_b,
    short_attention,
    supported,
)


def _qkv(b, s, d, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, s, d)).astype(dtype))
        for _ in range(3)
    )


@pytest.mark.parametrize(
    "b,s,d,h,causal",
    [
        (4, 50, 768, 12, False),   # ViT-B/32 tower shape
        (5, 77, 512, 8, True),     # text tower shape (causal)
        (2, 197, 768, 12, False),  # ViT-B/16 tower shape
        (3, 16, 128, 2, False),    # minimal lane-aligned shape
    ],
)
def test_matches_xla_formulation(b, s, d, h, causal):
    q, k, v = _qkv(b, s, d)
    out = short_attention(q, k, v, h, causal=causal)
    ref = _xla_merged(q, k, v, h, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_production_dispatch_path():
    """impl="short" through multi_head_attention == the default XLA path
    (the integration point every transformer block uses)."""
    q, k, v = _qkv(4, 50, 768, seed=3)
    a = multi_head_attention(q, k, v, 12, impl="short")
    b = multi_head_attention(q, k, v, 12, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batch_padding_roundtrip():
    """Batches that don't divide the block pad with zero rows and slice
    back exactly (zero-row softmax output never leaks)."""
    q, k, v = _qkv(3, 50, 256, seed=1)
    out = short_attention(q, k, v, 2, block_b=2)
    ref = _xla_merged(q, k, v, 2, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_xla():
    q, k, v = _qkv(2, 50, 256, seed=2)

    def loss_short(q, k, v):
        return (short_attention(q, k, v, 4, causal=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_merged(q, k, v, 4, True) ** 2).sum()

    gs = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-4)


def test_vitl336_shape_bf16():
    """ViT-L/14@336px tower shape (S=577, gb=1 cells) — only in-regime at
    the production bf16 itemsize; f32 cells exceed CELL_VMEM_LIMIT."""
    q, k, v = _qkv(1, 577, 1024, seed=9)
    ref = np.asarray(_xla_merged(q, k, v, 16, False))
    out = np.asarray(
        short_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), 16,
        ).astype(jnp.float32)
    )
    cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.999


def test_bf16_cosine_vs_f32():
    q, k, v = _qkv(2, 77, 512, seed=4)
    ref = np.asarray(_xla_merged(q, k, v, 8, False))
    out = np.asarray(
        short_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), 8,
        ).astype(jnp.float32)
    )
    cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.999


def test_supported_gate():
    q, k, v = _qkv(2, 50, 768)
    assert supported(q, k, v, 12)
    # the whole CLIP ladder is in-regime (bf16 production dtype)
    for (s, d, h) in [(77, 512, 8), (197, 768, 12), (257, 1024, 16),
                      (577, 1024, 16)]:
        qs, ks, vs = _qkv(1, s, d, dtype=np.float16)  # itemsize 2, like bf16
        assert supported(qs, ks, vs, h), (s, d)
    # the ViT-L@448px probe (S=1025, ~20 MiB whole-row cells) exceeds the
    # whole-row gate but qualifies via q tiling (measured +34% full-model)
    qb, kb, vb = _qkv(1, 1025, 1024, dtype=np.float16)
    from debiasing_multi_modal_tpu.ops.short_attention import _cell_bytes

    assert _cell_bytes(1025, 1024, 16, 2) > 12 << 20
    assert supported(qb, kb, vb, 16)
    # S past the policy bound
    ql, kl, vl = _qkv(1, MAX_SEQ_LEN + 64, 768)
    assert not supported(ql, kl, vl, 12)
    # D not lane-aligned
    qd, kd, vd = _qkv(2, 50, 192)
    assert not supported(qd, kd, vd, 3)
    # cross-attention (Sq != Skv) stays out
    assert not supported(q[:, :10], k, v, 12)
    # additive masks stay on the XLA path
    assert not supported(q, k, v, 12, mask=jnp.zeros((50, 50)))
    with pytest.raises(ValueError):
        short_attention(qd, kd, vd, 3)


class TestMeshPartitioning:
    """The kernel inside a multi-device jit (the production extraction step
    is a pjit over a dp mesh).  custom_partitioning gives the Mosaic custom
    call its SPMD rule: batch shards freely, D shards at head boundaries
    (the Megatron tp layout), S/head_dim stay replicated."""

    def _mesh(self, shape, names):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()).reshape(shape), names)

    def test_dp_sharded_batch_no_allgather(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh((8,), ("dp",))
        sh = NamedSharding(mesh, P("dp", None, None))
        q, k, v = _qkv(16, 50, 256, seed=5)
        f = jax.jit(
            lambda q, k, v: short_attention(q, k, v, 4, causal=True),
            in_shardings=(sh,) * 3, out_shardings=sh,
        )
        txt = f.lower(q, k, v).compile().as_text()
        assert "all-gather" not in txt
        out = f(q, k, v)
        assert out.sharding.is_equivalent_to(sh, 3)
        ref = _xla_merged(q, k, v, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_tp_head_boundary_d_sharding(self):
        """D sharded over 4 devices x 4 heads -> one head per shard,
        computed shard-locally (no all-gather of q/k/v)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh((2, 4), ("dp", "tp"))
        sh = NamedSharding(mesh, P("dp", None, "tp"))
        q, k, v = _qkv(8, 50, 256, seed=6)
        f = jax.jit(
            lambda q, k, v: short_attention(q, k, v, 4),
            in_shardings=(sh,) * 3, out_shardings=sh,
        )
        txt = f.lower(q, k, v).compile().as_text()
        assert "all-gather" not in txt
        out = f(q, k, v)
        ref = _xla_merged(q, k, v, 4, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_non_head_boundary_sharding_falls_back_replicated(self):
        """4 heads over an 8-way D sharding cannot slice at head boundaries;
        the partition rule replicates D (correctness over scaling)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh((8,), ("tp",))
        sh = NamedSharding(mesh, P(None, None, "tp"))
        q, k, v = _qkv(4, 50, 256, seed=7)
        f = jax.jit(
            lambda q, k, v: short_attention(q, k, v, 4),
            in_shardings=(sh,) * 3,
        )
        out = f(q, k, v)
        ref = _xla_merged(q, k, v, 4, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_grad_under_dp_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh((8,), ("dp",))
        sh = NamedSharding(mesh, P("dp", None, None))
        q, k, v = _qkv(8, 50, 256, seed=8)

        def loss(q, k, v):
            return (short_attention(q, k, v, 4) ** 2).sum()

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                    in_shardings=(sh,) * 3)(q, k, v)
        r = jax.grad(
            lambda q, k, v: (_xla_merged(q, k, v, 4, False) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-4)

    def test_packed_dp_sharded_batch_no_allgather(self):
        """The lane-packed variant's SPMD rule: batch shards freely (the
        packed lane axis stays replicated — q/k/v interleave there, so a
        D shard is not a head-local slice of all three)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from debiasing_multi_modal_tpu.ops.short_attention import (
            short_attention_packed,
        )

        mesh = self._mesh((8,), ("dp",))
        sh_in = NamedSharding(mesh, P("dp", None, None))
        rng = np.random.default_rng(12)
        qkv = jnp.asarray(
            rng.standard_normal((16, 50, 3 * 256)).astype(np.float32)
        )
        f = jax.jit(
            lambda p: short_attention_packed(p, 4, causal=True),
            in_shardings=(sh_in,), out_shardings=sh_in,
        )
        txt = f.lower(qkv).compile().as_text()
        assert "all-gather" not in txt
        out = f(qkv)
        assert out.sharding.is_equivalent_to(sh_in, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ref = _xla_merged(q, k, v, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


class TestQTiledMode:
    """Past the whole-row VMEM cell, _pallas_forward switches to q tiling
    (full kv resident, exact whole-row softmax, global causality from the
    tile id).  Forced here via the MAX_SEQ_LEN module attr; the auto gate
    stays wherever the measured policy put it."""

    def _long_qkv(self, b=1, s=1025, d=256, seed=11):
        return _qkv(b, s, d, seed=seed)

    def _with_gate(self, monkeypatch):
        from debiasing_multi_modal_tpu.ops import short_attention as sa

        monkeypatch.setattr(sa, "MAX_SEQ_LEN", 4096)
        return sa

    def test_picks_tiled_mode(self, monkeypatch):
        sa = self._with_gate(monkeypatch)
        q, k, v = self._long_qkv()
        # whole-row cell exceeds the limit -> supported only via tiling
        from debiasing_multi_modal_tpu.ops.short_attention import (
            _cell_bytes,
            pick_block_q,
        )

        assert _cell_bytes(1025, 256, 4, 4) > sa.CELL_VMEM_LIMIT
        assert pick_block_q(1025, 256, 4) is not None
        assert sa.supported(q, k, v, 4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_tiled_matches_xla(self, monkeypatch, causal):
        self._with_gate(monkeypatch)
        q, k, v = self._long_qkv()
        out = short_attention(q, k, v, 4, causal=causal)
        ref = _xla_merged(q, k, v, 4, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_tiled_ragged_seq_padding(self, monkeypatch):
        """S=1025 does not divide any q tile — padded rows must not leak
        (exercises the slice-back) and causality must hold at the ragged
        boundary."""
        self._with_gate(monkeypatch)
        q, k, v = self._long_qkv(s=1111, seed=12)
        out = short_attention(q, k, v, 4, causal=True)
        ref = _xla_merged(q, k, v, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_tiled_grads(self, monkeypatch):
        self._with_gate(monkeypatch)
        q, k, v = self._long_qkv(s=1025, seed=13)

        g = jax.grad(
            lambda q, k, v: (short_attention(q, k, v, 4, causal=True) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        r = jax.grad(
            lambda q, k, v: (_xla_merged(q, k, v, 4, True) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_pick_block_b_respects_budget():
    from debiasing_multi_modal_tpu.ops.short_attention import (
        VMEM_BUDGET_BYTES,
        _cell_bytes,
    )

    for (b, s, d, h) in [(1024, 50, 768, 12), (64, 197, 768, 12),
                         (4096, 77, 512, 8)]:
        gb = pick_block_b(b, s, d, h)
        assert gb >= 1 and (gb & (gb - 1)) == 0
        assert gb * _cell_bytes(s, d, h, 2) <= VMEM_BUDGET_BYTES or gb == 1


def test_qtiled_under_dp_mesh(monkeypatch):
    """The q-tiled mode must partition like the whole-row mode (same
    custom_partitioning wrapper around _pallas_forward)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from debiasing_multi_modal_tpu.ops import short_attention as sa

    monkeypatch.setattr(sa, "MAX_SEQ_LEN", 4096)
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sh = NamedSharding(mesh, P("dp", None, None))
    q, k, v = _qkv(8, 1025, 256, seed=14)
    f = jax.jit(lambda q, k, v: short_attention(q, k, v, 4, causal=True),
                in_shardings=(sh,) * 3, out_shardings=sh)
    txt = f.lower(q, k, v).compile().as_text()
    assert "all-gather" not in txt
    out = f(q, k, v)
    ref = _xla_merged(q, k, v, 4, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_auto_routes_to_short_on_tpu(monkeypatch):
    """The production policy: on TPU, auto prefers the merged-layout
    kernel whenever supported().  CPU-side guard via a recording stub
    (the real on-chip routing is measured in DESIGN §8.8)."""
    from debiasing_multi_modal_tpu.ops import attention as att
    from debiasing_multi_modal_tpu.ops import short_attention as sa

    monkeypatch.setattr(att, "_on_tpu", lambda: True)
    calls = []

    def fake_short(q, k, v, h, causal=False, **kw):
        calls.append((q.shape, h, causal))
        return jnp.zeros_like(q)

    monkeypatch.setattr(sa, "short_attention", fake_short)
    q, k, v = _qkv(2, 50, 768, seed=20)
    att.multi_head_attention(q, k, v, 12, impl="auto", causal=True)
    assert calls == [((2, 50, 768), 12, True)]

    # an additive mask must stay on the XLA path (no routing, no error)
    m = jnp.zeros((50, 50), jnp.float32)
    att.multi_head_attention(q, k, v, 12, mask=m, impl="auto")
    assert len(calls) == 1

    # forcing impl="short" with a mask is a loud error
    with pytest.raises(ValueError):
        att.multi_head_attention(q, k, v, 12, mask=m, impl="short")

    # out-of-regime S falls through (no routing)
    ql, kl, vl = _qkv(1, 2048, 768, seed=21)
    att.multi_head_attention(ql, kl, vl, 12, impl="auto")
    assert len(calls) == 1


class TestImageMerge:
    """merge=m folds m images of a grid cell into one block-diagonally
    masked [m*S, m*S] score matrix (fewer, larger MXU dots; the S -> 128
    lane padding amortizes over m).  Exact up to f32 reduction order —
    the contraction runs over m*S lanes, so outputs may differ from
    merge=1 by ~1 ulp of the compute dtype."""

    @pytest.mark.parametrize("m", [2, 4])
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_unmerged(self, m, causal):
        q, k, v = _qkv(8, 50, 256, seed=30)
        out = short_attention(q, k, v, 4, causal=causal, merge=m)
        ref = _xla_merged(q, k, v, 4, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_batch_not_multiple_of_merge(self):
        """B=5 with merge=4 pads to one 8-image cell; padded rows are
        masked off the real images' blocks so nothing leaks."""
        q, k, v = _qkv(5, 50, 256, seed=31)
        out = short_attention(q, k, v, 4, merge=4)
        ref = _xla_merged(q, k, v, 4, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_bf16_ulp_vs_unmerged(self):
        q, k, v = _qkv(8, 50, 768, dtype=np.float32, seed=32)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        a = np.asarray(short_attention(q, k, v, 12, merge=1),
                       dtype=np.float32)
        b = np.asarray(short_attention(q, k, v, 12, merge=2),
                       dtype=np.float32)
        # one bf16 ulp at unit scale
        assert np.max(np.abs(a - b)) <= 2 * 0.0078125

    def test_grads_with_merge(self):
        q, k, v = _qkv(4, 50, 256, seed=33)
        g = jax.grad(
            lambda q, k, v: (short_attention(q, k, v, 4, merge=2) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        r = jax.grad(
            lambda q, k, v: (_xla_merged(q, k, v, 4, False) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-4)

    def test_merge_under_dp_mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        sh = NamedSharding(mesh, P("dp", None, None))
        q, k, v = _qkv(16, 50, 256, seed=34)
        f = jax.jit(lambda q, k, v: short_attention(q, k, v, 4, merge=2),
                    in_shardings=(sh,) * 3, out_shardings=sh)
        out = f(q, k, v)
        ref = _xla_merged(q, k, v, 4, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_vmem_overflow_falls_back(self):
        """A merge whose [m*S, m*S] cell exceeds CELL_VMEM_LIMIT silently
        drops to merge=1 rather than OOMing Mosaic."""
        from debiasing_multi_modal_tpu.ops.short_attention import (
            CELL_VMEM_LIMIT,
            _cell_bytes,
        )

        s, d, h = 577, 256, 4
        assert _cell_bytes(s, d, h, 4) <= CELL_VMEM_LIMIT
        assert _cell_bytes(s, d, h, 4, merge=8) > CELL_VMEM_LIMIT
        q, k, v = _qkv(8, s, d, seed=35)
        out = short_attention(q, k, v, h, merge=8)
        ref = _xla_merged(q, k, v, h, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_pick_merge_default_and_force(self):
        """Auto policy is the measured merge=1 (full-model null on m=2/4/8,
        DESIGN §8.8 round 5); DMT_SHORT_MERGE (probe-only, read at import)
        forces it in fresh processes."""
        import subprocess
        import sys

        from debiasing_multi_modal_tpu.ops.short_attention import pick_merge

        assert pick_merge(512, 50, 768, 12) == 1
        code = (
            "from debiasing_multi_modal_tpu.ops import short_attention as sa\n"
            "assert sa._FORCE_MERGE == 4, sa._FORCE_MERGE\n"
            "assert sa.pick_merge(512, 50, 768, 12) == 4\n"
            "assert sa.pick_merge(2, 50, 768, 12) == 2  # capped at b\n"
            "assert sa.pick_merge(3, 50, 768, 12) == 2  # pow2 floor\n"
        )
        env = dict(os.environ, DMT_SHORT_MERGE="4", JAX_PLATFORMS="")
        subprocess.run([sys.executable, "-c", code], check=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))


def test_force_gb_env_override():
    """DMT_SHORT_BLOCK_B (probe-only) forces the whole-row batch block;
    read once at import, so probe in a subprocess like the gb sweeps do."""
    import subprocess
    import sys

    code = (
        "from debiasing_multi_modal_tpu.ops import short_attention as sa\n"
        "assert sa._FORCE_GB == 4, sa._FORCE_GB\n"
        "assert sa.pick_block_b(512, 50, 768, 12) == 4\n"
        "assert sa.pick_block_b(2, 50, 768, 12) == 2  # capped at b\n"
    )
    env = dict(os.environ, DMT_SHORT_BLOCK_B="4", JAX_PLATFORMS="")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(__file__)))
    # unset (the default everywhere but probes): the byte model decides
    from debiasing_multi_modal_tpu.ops.short_attention import _FORCE_GB
    assert _FORCE_GB == 0
