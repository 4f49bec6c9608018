"""Fused-attention op tests: XLA path vs. naive math, and the Pallas kernel
(interpret mode on CPU) vs. the XLA path, including causal masks and
non-multiple-of-block sequence lengths (CLIP's 50/77/257)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.ops.attention import (
    _xla_attention,
    multi_head_attention,
)
from debiasing_multi_modal_tpu.ops.flash_attention import flash_attention


def _naive(q, k, v, causal=False):
    scale = q.shape[-1] ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if causal:
        sq, skv = q.shape[1], k.shape[1]
        mask = np.tril(np.ones((sq, skv), bool))
        logits = np.where(mask, logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [50, 77])
def test_xla_attention_matches_naive(rng, causal, seq):
    q = rng.standard_normal((2, seq, 2, 64)).astype(np.float32)
    k = rng.standard_normal((2, seq, 2, 64)).astype(np.float32)
    v = rng.standard_normal((2, seq, 2, 64)).astype(np.float32)
    out = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    np.testing.assert_allclose(np.asarray(out), _naive(q, k, v, causal), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq,hd", [(77, 64), (257, 64), (128, 128), (130, 64)])
def test_flash_kernel_matches_xla(rng, causal, seq, hd):
    q = rng.standard_normal((2, seq, 2, hd)).astype(np.float32)
    k = rng.standard_normal((2, seq, 2, hd)).astype(np.float32)
    v = rng.standard_normal((2, seq, 2, hd)).astype(np.float32)
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bf16_logit_rounding_bound(rng):
    """bf16 activations store the logits in bf16 (one MXU-epilogue rounding,
    softmax math still f32 — ops/attention.py module policy).  The outputs
    must stay within a tight cosine bound of the all-f32 computation even at
    extreme logit magnitudes (std ~10; trained CLIP layers sit well below)."""
    a = np.sqrt(10.0)  # logit std = a^2 for N(0,1) q,k at head_dim 64
    q = (rng.standard_normal((4, 50, 12, 64)) * a).astype(np.float32)
    k = (rng.standard_normal((4, 50, 12, 64)) * a).astype(np.float32)
    v = rng.standard_normal((4, 50, 12, 64)).astype(np.float32)
    ref = np.asarray(
        _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    out = np.asarray(
        _xla_attention(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16),
        ).astype(jnp.float32)
    )
    cos = (ref * out).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    )
    assert cos.min() > 0.98, cos.min()
    assert cos.mean() > 0.999, cos.mean()


def test_additive_mask_matches_reference_semantics(rng):
    """A materialized additive causal mask must equal the in-kernel causal
    path (reference builds a -inf upper-triangular mask, clip/model.py:328)."""
    q = rng.standard_normal((1, 77, 2, 64)).astype(np.float32)
    mask = np.triu(np.full((77, 77), -np.inf, np.float32), 1)
    a = _xla_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), causal=True)
    b = _xla_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq,skv", [(77, 77), (130, 130), (64, 192)],
                         ids=["s77", "padded130", "cross"])
def test_flash_backward_matches_xla_grads(rng, causal, seq, skv):
    """The blockwise backward kernels (dQ, dK/dV over the saved logsumexp)
    must reproduce jax.grad of the XLA formulation."""
    if causal and seq != skv:
        pytest.skip("causal cross-attention undefined here")
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, seq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, seq, h, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, interpret=True) * t)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=causal) * t)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_auto_dispatch_policy():
    """auto -> Pallas only for long sequences whose XLA score tensor would
    be prohibitive: every FULL MODEL measured (S=50..1025, incl. the real
    S=1025 ViT-L/14@448px) favors XLA when its scores fit — synthetic-layer
    wins did not survive full-model fusion (docs/DESIGN.md §5)."""
    from debiasing_multi_modal_tpu.ops import flash_attention as fa

    mk = lambda b, s, h, d: jnp.zeros((b, s, h, d), jnp.bfloat16)  # noqa: E731
    # CLIP-scale and real long-context models: XLA
    assert not fa.supported(mk(512, 50, 12, 64), mk(512, 50, 12, 64), mk(512, 50, 12, 64))
    assert not fa.supported(mk(64, 257, 16, 64), mk(64, 257, 16, 64), mk(64, 257, 16, 64))
    vl = mk(128, 577, 16, 64)
    assert not fa.supported(vl, vl, vl)
    vl448 = mk(32, 1025, 16, 64)  # the decisive full-model datum
    assert not fa.supported(vl448, vl448, vl448)
    # long but fits comfortably -> XLA
    assert not fa.supported(mk(4, 4096, 8, 64), mk(4, 4096, 8, 64), mk(4, 4096, 8, 64))
    # prohibitive score tensor (17 GiB bf16) -> Pallas (iff pltpu available)
    big = mk(64, 4096, 8, 64)
    assert fa.supported(big, big, big) == fa._HAS_PLTPU
    # byte accounting follows the activation dtype
    bf = mk(16, 4096, 8, 64)
    assert not fa.supported(bf, bf, bf)  # 4.3 GiB bf16 scores: XLA
    f32 = jnp.zeros((16, 4096, 8, 64), jnp.float32)
    assert fa.supported(f32, f32, f32) == fa._HAS_PLTPU  # 8.6 GiB f32
    # asymmetric shapes: XLA won every cross shape that fits (round 3,
    # scripts/bench_cross_attention.py), and a short side < 1024 cannot
    # produce prohibitive scores before q/o dominate HBM -> XLA
    assert not fa.supported(mk(64, 4096, 8, 64), mk(64, 77, 8, 64), mk(64, 77, 8, 64))
    # at the threshold with both sides long, pallas takes the 12 GiB cell
    xl = (mk(48, 8192, 8, 64), mk(48, 2048, 8, 64), mk(48, 2048, 8, 64))
    assert fa.supported(*xl) == fa._HAS_PLTPU
    # additive masks and odd head dims stay on XLA
    assert not fa.supported(big, big, big, mask=jnp.zeros(()))
    odd = mk(64, 4096, 8, 80)
    assert not fa.supported(odd, odd, odd)


def test_head_packing_factors_and_equivalence(rng):
    """Head-packing merges G batch*head rows per grid cell for the
    many-tiny-heads regime; every packing factor must be numerically
    identical to the unpacked XLA reference."""
    from debiasing_multi_modal_tpu.ops.flash_attention import _heads_per_cell

    assert _heads_per_cell(512 * 12, 128, 64) == 16   # ViT-B/32 shapes
    assert _heads_per_cell(2 * 8, 1024, 64) == 4      # mid-length context
    assert _heads_per_cell(2 * 8, 4096, 64) == 1      # long context: unpacked
    assert _heads_per_cell(3, 128, 64) == 1           # indivisible bh

    for b, h, seq in ((16, 4, 50), (1, 3, 130), (2, 8, 257)):
        q = rng.standard_normal((b, seq, h, 64)).astype(np.float32)
        k = rng.standard_normal((b, seq, h, 64)).astype(np.float32)
        v = rng.standard_normal((b, seq, h, 64)).astype(np.float32)
        ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        out = flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_merged_head_wrapper(rng):
    x = rng.standard_normal((2, 50, 128)).astype(np.float32)
    out = multi_head_attention(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), num_heads=2, impl="xla"
    )
    assert out.shape == (2, 50, 128)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_big_blocks_fwd_bwd_parity(rng, causal):
    """The long-sequence block configuration (bq 512 / bkv 256, picked by
    _pick_blocks from S >= 1024) must match the XLA formulation forward and
    backward — including a ragged tail (S=1100 pads to 1536)."""
    b, s, h, d = 1, 1100, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    from debiasing_multi_modal_tpu.ops.flash_attention import _pick_blocks

    assert _pick_blocks(s, s) == (512, 256)

    out = flash_attention(q, q, q, causal=causal, interpret=True)
    ref = _xla_attention(q, q, q, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q, q, causal=causal, interpret=True) * t)

    def loss_xla(q):
        return jnp.sum(_xla_attention(q, q, q, causal=causal) * t)

    g_f = jax.grad(loss_flash)(q)
    g_x = jax.grad(loss_xla)(q)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_x), rtol=5e-4, atol=5e-4
    )


def test_head_packing_vmem_budget():
    """The packing chooser must respect Mosaic's 16 MB scoped-VMEM limit:
    the per-cell working set grows ~linearly in g at
    ``16*bq*bkv + 3584*bq`` bytes (fitted on measured scoped-OOM sizes,
    scripts/bench_cross_attention.py probes).  Round 2's kv-rows-only rule
    picked g16 for long-query/short-kv cross-attention (short kv stream +
    512-row q blocks) and VMEM-OOMed on hardware; every measured self-
    attention anchor must keep its round-2 packing unchanged."""
    from debiasing_multi_modal_tpu.ops.flash_attention import _heads_per_cell

    # measured round-2 anchors: unchanged
    assert _heads_per_cell(6144, 128, 64, 128, 128) == 16   # S=50 small blocks
    assert _heads_per_cell(1024, 640, 64, 640, 640) == 4    # 640 window
    assert _heads_per_cell(128, 1024, 64, 512, 256) == 4    # 1k-ctx self
    assert _heads_per_cell(32, 4096, 64, 512, 512) == 1     # 4k-ctx self
    assert _heads_per_cell(256, 1024, 64, 512, 256) == 4    # q8k/kv1k cross
    # round-3 VMEM fixes: previously g16 -> scoped OOM (43.81M vs 16M)
    assert _heads_per_cell(128, 256, 64, 512, 128) == 4     # q4k/kv256
    assert _heads_per_cell(2048, 128, 64, 512, 128) == 4    # q1k/kv77
    # explicit whole-kv block overrides past the 640 window fall through
    # to the fitted cap instead of the carve-out (g=1, not min(rows,4))
    assert _heads_per_cell(32, 2048, 64, 512, 2048) == 1


def test_flash_invalid_heads_per_cell_rejected(rng):
    """A heads_per_cell override that doesn't divide the merged batch*head
    dim must raise, not silently leave output rows uncomputed."""
    q = jnp.asarray(rng.standard_normal((3, 64, 8, 64)), jnp.float32)
    with pytest.raises(ValueError, match="heads_per_cell"):
        flash_attention(q, q, q, interpret=True, heads_per_cell=16)  # bh=24
    with pytest.raises(ValueError, match="heads_per_cell"):
        flash_attention(q, q, q, interpret=True, heads_per_cell=-1)


def test_flash_cross_attention_long_query_short_kv(rng):
    """Long-query/short-kv shapes (the round-3 VMEM-OOM regime) must be
    numerically identical to XLA, including explicit block/packing
    overrides through the static heads_per_cell argument."""
    b, sq, skv, h, d = 2, 1024, 100, 4, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)  # auto blocks: bq=512
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    out2 = flash_attention(
        q, k, v, interpret=True, block_q=256, block_kv=128, heads_per_cell=2
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_whole_block_window_parity(rng):
    """S=577 (ViT-L/14@336px) routes through whole-sequence cells
    (bq=bkv=640); forward must match XLA including the 63 padded rows."""
    from debiasing_multi_modal_tpu.ops.flash_attention import _pick_blocks

    assert _pick_blocks(577, 577) == (640, 640)
    b, s, h, d = 1, 577, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    out = flash_attention(q, q, q, interpret=True)
    ref = _xla_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_rejects_additive_mask_loudly():
    """Masked attention must use the XLA path; the Pallas entry raises an
    unconditional ValueError (an assert would be stripped under python -O
    and silently DROP the mask)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from debiasing_multi_modal_tpu.ops.flash_attention import flash_attention

    q = jnp.zeros((1, 8, 2, 4), jnp.float32)
    with pytest.raises(ValueError, match="XLA path"):
        flash_attention(q, q, q, mask=np.zeros((8, 8), np.float32),
                        interpret=True)


def test_flash_dp_sharded_no_allgather(rng):
    """flash_attention inside a multi-device jit: the custom_partitioning
    rule shards the merged batch*head axis, so a dp-sharded batch runs
    shard-locally (no all-gather) — forward AND both backward kernels."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sh = NamedSharding(mesh, P("dp", None, None, None))
    q = jnp.asarray(rng.standard_normal((8, 64, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((8, 80, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((8, 80, 4, 64)).astype(np.float32))

    f = jax.jit(lambda q, k, v: flash_attention(q, k, v),
                in_shardings=(sh,) * 3, out_shardings=sh)
    txt = f.lower(q, k, v).compile().as_text()
    assert "all-gather" not in txt
    out = f(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), _naive(np.asarray(q), np.asarray(k), np.asarray(v)),
        atol=2e-5,
    )

    def loss(q, k, v):
        return (flash_attention(q, k, v, causal=True) ** 2).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                in_shardings=(sh,) * 3)
    gtxt = g.lower(q, k, v).compile().as_text()
    assert "all-gather" not in gtxt
    got = g(q, k, v)
    want = jax.grad(
        lambda q, k, v: (_xla_attention(q, k, v, causal=True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
