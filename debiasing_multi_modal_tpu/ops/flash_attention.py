"""Blockwise (flash-style) fused attention kernel in Pallas for TPU.

The reference leans on cuDNN's fused attention via
``F.multi_head_attention_forward`` / ``nn.MultiheadAttention``
(clip/model.py:72-90, 175-187).  The TPU-native equivalent is this Pallas
kernel: online-softmax blockwise attention that never materializes the
[Sq, Skv] score matrix in HBM, with the causal mask generated from block
indices instead of a stored 77x77 buffer (clip/model.py:328-334).

At reference sequence lengths (50-257 tokens) this is a fusion win rather
than a memory win, but the kernel is written blockwise so pod-scale
longer-context configurations (ViT-L/14 and beyond) get it unchanged
(SURVEY.md §5.7).

Layout contract: q [B, Sq, H, D], k/v [B, Skv, H, D] (merged-batch=B*H
internally).  Sequence dims are zero-padded to the 128-lane block size with
explicit key-padding masking, so any CLIP context length works.

Differentiable end to end: the forward kernel emits the per-row logsumexp and
the custom VJP runs blockwise dQ and dK/dV kernels over it (the standard
flash-attention backward), so neither pass ever materializes the
[B, H, Sq, Skv] score tensor — long-context encoder fine-tuning works where
the XLA backward cannot exist.  Gradients are tested against jax.grad of the
XLA formulation (causal, padded, cross-attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

try:  # TPU backend only; tests fall back to interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BLOCK_Q = 128  # short-sequence default; long sequences pick bigger blocks
BLOCK_KV = 128
_NEG_INF = float(-1e30)


def _pad128(s: int) -> int:
    return -(-s // 128) * 128


def _pick_blocks(sq: int, skv: int) -> tuple[int, int]:
    """Measured block choice (scripts/tune_flash_blocks.py, v5e round 2).

    Mosaic's per-grid-step overhead dominates the kernel at many-small-cells
    shapes; 512-row q blocks amortize it (S=4096 bs16: 56 -> 13.4 ms, from
    3.6x slower than XLA to 1.17x FASTER).  512-wide kv blocks additionally
    win once the kv stream is long (>= 4k); 256 is better below that.

    In the 512-640 padded window, WHOLE-sequence cells (one q block, one kv
    block, no inner loop) are the kernel's best shape: 7.5 -> 8.9 ms
    standalone and 189 -> 238.5 imgs/s inside the forced-Pallas ViT-L/14
    @336px encode.  (XLA's fused path still wins that model at 262.9, so
    auto does NOT route here — the window only improves impl="pallas".)
    Shorter sequences keep 128/128 (their padding waste would dominate).
    """
    if 512 <= sq < 1024 and _pad128(sq) <= 640 and _pad128(skv) <= 640:
        return _pad128(sq), _pad128(skv)
    bq = 512 if sq >= 1024 else BLOCK_Q
    if skv >= 4096:
        bkv = 512
    elif skv >= 1024:
        bkv = 256
    else:
        bkv = BLOCK_KV
    return bq, bkv


# Auto-dispatch policy (measured on v5e, rounds 1-2; scripts/bench_attention.py
# + in-context encoders; docs/DESIGN.md §5 carries the full tables):
#
# - CLIP-scale sequences (50-577 tokens): XLA wins IN-CONTEXT (ViT-B/32
#   encode at batch 512: 64.7 ms XLA vs 77.0 ms Pallas; ViT-L/14@336px
#   262 vs 189 imgs/s).  Standalone microbenchmarks at these shapes say the
#   opposite — they miss XLA's fusion with the surrounding projections;
#   never dispatch on standalone numbers.
# - The measured-blocks kernel (_pick_blocks) wins standalone and in
#   SYNTHETIC transformer layers from 1k tokens (1.12-1.22x at S=1k-4k) —
#   but EVERY full model measured still favors XLA: ViT-L/14@336px
#   (S=577: 262.9 vs 238.5 imgs/s) and ViT-L/14@448px (S=1025: 115.1 vs
#   87.4 imgs/s, where the 512-row q blocks also pad 1025 -> 1536).
#   Synthetic-layer wins do not survive full-model fusion; the S=1025
#   full model is the decisive datum (scripts/profile_vitl_448.py).
# - The kernel's PROVEN role is the memory regime: the XLA path
#   materializes an activation-dtype [B, H, Sq, Skv] score tensor, so past
#   a few GiB it degrades and then OOMs; the blockwise kernel never
#   materializes it and (with measured blocks) runs that regime 4.8x
#   faster than its round-1 form (S=4096 bs64, 34 GB of logits: 43 ms).
#
# "auto" therefore takes the Pallas path only when the sequence is long
# AND XLA's score tensor would be prohibitive; pass impl="pallas" to
# force (the tuned blocks make forced-Pallas competitive everywhere long).
MIN_AUTO_SEQ_LEN = 1024
# XLA won every full model whose score tensor fit (up to 8.6 GB of logits
# on the 16 GB chip); "prohibitive" starts where the materialization would
# crowd out weights/activations in a real program.
SCORE_BYTES_THRESHOLD = 8 << 30  # 8 GiB of attention logits


def supported(q, k, v, *, mask=None) -> bool:
    """Whether the auto-dispatch should take the Pallas path."""
    if mask is not None:  # additive masks stay on the XLA path
        return False
    if q.shape[-1] % 64 != 0:  # head_dim must tile onto lanes
        return False
    # asymmetric (cross-attention) shapes measured in round 3
    # (scripts/bench_cross_attention.py): XLA wins EVERY asymmetric shape
    # whose score tensor fits (0.54-1.05x pallas/xla at q4k/kv256,
    # q256/kv4k, q1k/kv77, q8k/kv1k), so the min() guard stays; a short
    # side below 1024 also can't produce a prohibitive score tensor before
    # the q/o tensors themselves dominate HBM.  At the threshold the
    # routed cell is a measured near-tie (q8k/kv2k, 12 GiB of logits:
    # 46.8 vs 45.5 ms) — the Pallas path is insurance against the logits
    # crowding out weights/activations in a real program, at ~3% cost.
    if min(q.shape[1], k.shape[1]) < MIN_AUTO_SEQ_LEN:
        return False
    b, sq, h, _ = q.shape
    # the XLA path stores logits in the activation dtype (ops/attention.py)
    score_bytes = jnp.dtype(q.dtype).itemsize * b * h * sq * k.shape[1]
    if score_bytes < SCORE_BYTES_THRESHOLD:  # XLA still wins full models
        return False
    return _HAS_PLTPU


def _heads_per_cell(
    bh: int, skv_pad: int, head_dim: int,
    block_q: int = BLOCK_Q, block_kv: int = BLOCK_KV,
    budget: int = 16 << 20,
) -> int:
    """Largest packing factor g (divides the merged batch*head dim) whose
    per-cell working set stays inside Mosaic's 16 MB scoped-VMEM limit.

    Measured regimes (v5e, scripts/bench_cross_attention.py probes via the
    static ``heads_per_cell`` arg — a fresh trace per value; patching this
    function is silently ignored after the first trace):

    - kv-rows rule (round 2): ``g * skv_pad <= 4096`` — correct for every
      measured SELF-attention shape, where a long kv stream shrinks g
      before the q-block buffers matter.  Kept as an upper bound so no
      measured dispatch changes.
    - big-q-block cap (round 3): the scoped allocation grows linearly in g
      at ~``16*block_q*block_kv + 3584*block_q`` bytes per packed head
      (fitted: 43.81M @ g16 and 21.81M @ g8 for 512x128 blocks, 25.82M
      @ g8 for 512x256; g4 compiles in both).  Long-query/short-kv
      cross-attention has a short kv stream AND 512-row q blocks, so the
      rows rule alone picked g16 and VMEM-OOMed (surfacing as an opaque
      tunnel HTTP 500).
    - whole-sequence cells (block_kv == skv_pad in the 512-640 window) are
      measured far lighter (g4 at 640x640 compiles and wins, round 2);
      the rows rule stands there, capped at the measured g4.
    """
    rows_g = 1
    for g in (16, 8, 4, 2):
        if bh % g == 0 and g * skv_pad <= 4096 and head_dim * g <= 4096:
            rows_g = g
            break
    if block_kv == skv_pad and 512 <= block_q <= 640 and block_kv <= 640:
        return min(rows_g, 4)  # rows_g >= 4 implies 4 | bh
    per_g = 16 * block_q * block_kv + 3584 * block_q
    cap = budget // per_g
    for g in (16, 8, 4, 2):
        if bh % g == 0 and g <= min(rows_g, cap):
            return g
    return 1


def _attn_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len, causal,
    block_kv,
):
    """Forward that also emits the row logsumexp (training residual).

    Dots run in the INPUT dtype with f32 accumulation
    (``preferred_element_type``): bf16 activations hit the MXU's bf16 path
    (~4x its f32 rate on v5e) — upcasting operands before the dot was
    measured to cost the kernel ~3x at ViT-L shapes.  Softmax math stays
    f32 on the f32-accumulated scores (strictly tighter than the XLA path,
    which rounds the stored logits to the activation dtype).
    """
    iq = pl.program_id(1)
    q = q_ref[...]
    g, bq, d = q.shape
    skv_pad = k_ref.shape[1]
    n_kv = skv_pad // block_kv
    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0)

    def body(jkv, carry):
        acc, m, l = carry
        k = k_ref[:, pl.dslice(jkv * block_kv, block_kv), :]
        v = v_ref[:, pl.dslice(jkv * block_kv, block_kv), :]
        s = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        kv_pos = jkv * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_kv), 1
        )
        valid = kv_pos < kv_len
        if causal:
            valid = jnp.logical_and(valid, kv_pos <= q_pos)
        s = jnp.where(valid[None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        # p rounds to the value dtype for the MXU (standard flash practice;
        # the accumulator stays f32)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((g, bq, d), jnp.float32)
    m0 = jnp.full((g, bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, bq, 1), jnp.float32)
    if causal:
        n_needed = jnp.minimum(
            n_kv, (iq * bq + bq + block_kv - 1) // block_kv
        )
    else:
        n_needed = n_kv
    acc, m, l = jax.lax.fori_loop(0, n_needed, body, (acc0, m0, l0))
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = (acc / safe_l).astype(o_ref.dtype)
    # rows with no valid keys (padding) get +BIG so the backward's
    # exp(s - lse) underflows to exactly zero
    lse = jnp.where(l > 0.0, m + jnp.log(safe_l), -_NEG_INF)
    lse_ref[...] = lse  # [G, BQ, 1] — trailing singleton for TPU tiling


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, kv_len, causal, block_kv,
):
    """dQ for one (packed-heads, q-block) cell, streaming kv blocks.

    Dots in the input dtype with f32 accumulation (see _attn_fwd_kernel);
    ds rounds to the operand dtype before its MXU dot.
    """
    iq = pl.program_id(1)
    q = q_ref[...]
    do = do_ref[...]
    lse = lse_ref[...][..., 0]  # [G, BQ] (stored with trailing singleton)
    delta = delta_ref[...][..., 0]
    g, bq, d = q.shape
    skv_pad = k_ref.shape[1]
    n_kv = skv_pad // block_kv
    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0)

    def body(jkv, dq):
        k = k_ref[:, pl.dslice(jkv * block_kv, block_kv), :]
        v = v_ref[:, pl.dslice(jkv * block_kv, block_kv), :]
        s = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse[..., None])
        kv_pos = jkv * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_kv), 1
        )
        valid = kv_pos < kv_len
        if causal:
            valid = jnp.logical_and(valid, kv_pos <= q_pos)
        p = jnp.where(valid[None], p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None]) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if causal:
        n_needed = jnp.minimum(
            n_kv, (iq * bq + bq + block_kv - 1) // block_kv
        )
    else:
        n_needed = n_kv
    dq = jax.lax.fori_loop(
        0, n_needed, body, jnp.zeros((g, bq, d), jnp.float32)
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, kv_len, causal, block_q,
):
    """dK/dV for one (packed-heads, kv-block) cell, streaming q blocks.

    Dots in the input dtype with f32 accumulation (see _attn_fwd_kernel).
    """
    jkv = pl.program_id(1)
    k = k_ref[...]  # [G, BKV, D]
    v = v_ref[...]
    g, bkv, d = k.shape
    sq_pad = q_ref.shape[1]
    n_q = sq_pad // block_q
    kv_pos = jkv * bkv + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, bkv), 1
    )
    kv_valid = kv_pos < kv_len

    def body(iq, carry):
        dk, dv = carry
        q = q_ref[:, pl.dslice(iq * block_q, block_q), :]
        do = do_ref[:, pl.dslice(iq * block_q, block_q), :]
        lse = lse_ref[:, pl.dslice(iq * block_q, block_q), 0]
        delta = delta_ref[:, pl.dslice(iq * block_q, block_q), 0]
        s = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [G, BQ, BKV]
        p = jnp.exp(s - lse[..., None])
        valid = kv_valid
        if causal:
            q_pos = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bkv), 0
            )
            valid = jnp.logical_and(valid, kv_pos <= q_pos)
        p = jnp.where(valid[None], p, 0.0)
        pd = p.astype(do.dtype)
        dv_new = dv + jax.lax.dot_general(
            pd, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None]) * scale
        dk_new = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return dk_new, dv_new

    if causal:
        # q blocks strictly above this kv block's diagonal contribute nothing
        start = (jkv * bkv) // block_q
    else:
        start = 0
    dk0 = jnp.zeros((g, bkv, d), jnp.float32)
    dv0 = jnp.zeros((g, bkv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start, n_q, body, (dk0, dv0))
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _merge_pad(x, b, h, d, s_pad):
    """[B, S, H, D] -> zero-padded [B*H, s_pad, D]."""
    m = x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)
    return _pad_to(m, s_pad, 1)


def _shard_dim0_partitioning(impl_factory, rule, n_in, n_out):
    """custom_partitioning for a merged-[B*H, S, D] pallas call: dim 0 is
    embarrassingly parallel (each batch*head row is an independent
    attention problem), every other dim must be replicated.  A bare Mosaic
    custom call has no SPMD rule, so inside a multi-device jit GSPMD would
    otherwise replicate the whole computation (same gap short_attention.py
    closes for the merged-layout kernel; the production trainers/extractors
    are pjits over dp meshes).  ``impl_factory()`` returns the per-shard
    implementation (closing over the statics); ``rule`` is the Shardy
    einsum-like rule string."""

    @custom_partitioning
    def wrapped(*args):
        return impl_factory()(*args)

    def _norm(mesh, sharding, ndim):
        spec = getattr(sharding, "spec", None)
        lead = None
        if spec is not None and len(tuple(spec)) > 0:
            lead = tuple(spec)[0]
        return NamedSharding(
            mesh, PartitionSpec(lead, *([None] * (ndim - 1)))
        )

    def partition(mesh, arg_shapes, result_shape):
        lead = _norm(mesh, arg_shapes[0].sharding, arg_shapes[0].ndim)
        arg_shardings = tuple(
            NamedSharding(mesh, PartitionSpec(lead.spec[0],
                                              *([None] * (a.ndim - 1))))
            for a in arg_shapes
        )
        results = (result_shape,) if n_out == 1 else tuple(result_shape)
        result_shardings = tuple(
            NamedSharding(mesh, PartitionSpec(lead.spec[0],
                                              *([None] * (r.ndim - 1))))
            for r in results
        )
        if n_out == 1:
            result_shardings = result_shardings[0]

        def lower_fn(*args):
            return impl_factory()(*args)

        return mesh, lower_fn, result_shardings, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        lead = _norm(mesh, arg_shapes[0].sharding, arg_shapes[0].ndim)
        results = (result_shape,) if n_out == 1 else tuple(result_shape)
        out = tuple(
            NamedSharding(mesh, PartitionSpec(lead.spec[0],
                                              *([None] * (r.ndim - 1))))
            for r in results
        )
        return out[0] if n_out == 1 else out

    # every non-leading factor needs replication (S blocks see the whole
    # kv stream; D is the head dim).  Shardy requires the special-factor
    # list in rule-appearance (index) order, not alphabetical.
    factors = []
    for tok in rule.replace(",", " ").replace("->", " ").split():
        if tok != "m" and tok not in factors:
            factors.append(tok)
    wrapped.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(factors),
    )
    return wrapped


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale, sq, skv, causal, interpret, block_q, block_kv,
                     g):
    def impl_factory():
        def impl(qm, km, vm):
            return _flash_fwd_padded_impl(
                qm, km, vm, scale=scale, sq=sq, skv=skv, causal=causal,
                interpret=interpret, block_q=block_q, block_kv=block_kv,
                g=g,
            )

        return impl

    return _shard_dim0_partitioning(
        impl_factory, "m s d, m t d, m t d -> m s d, m s z",
        n_in=3, n_out=2,
    )


def _flash_fwd_padded(qm, km, vm, *, scale, sq, skv, causal, interpret,
                      block_q, block_kv, g=None):
    return _partitioned_fwd(
        scale, sq, skv, causal, interpret, block_q, block_kv, g
    )(qm, km, vm)


def _flash_fwd_padded_impl(qm, km, vm, *, scale, sq, skv, causal, interpret,
                           block_q, block_kv, g=None):
    bh, sq_pad, d = qm.shape
    skv_pad = km.shape[1]
    if g is not None and (g <= 0 or bh % g):
        raise ValueError(
            f"heads_per_cell={g} must be positive and divide the merged "
            f"batch*head dim {bh} (a non-divisor leaves output rows "
            f"uncomputed)"
        )
    g = g or _heads_per_cell(bh, skv_pad, d, block_q, block_kv)
    grid = (bh // g, sq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel, scale=scale, kv_len=skv, causal=causal,
            block_kv=block_kv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((g, skv_pad, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((g, skv_pad, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((g, block_q, 1), lambda bh, iq: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_pad, d), qm.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qm, km, vm)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, interpret, block_q, block_kv, g):
    return _flash_fwd_rule(q, k, v, causal, interpret, block_q, block_kv, g)[0]


def _flash_fwd_rule(q, k, v, causal, interpret, block_q, block_kv, g):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = d ** -0.5
    sq_pad = -(-sq // block_q) * block_q
    skv_pad = -(-skv // block_kv) * block_kv
    qm = _merge_pad(q, b, h, d, sq_pad)
    km = _merge_pad(k, b, h, d, skv_pad)
    vm = _merge_pad(v, b, h, d, skv_pad)
    om, lse = _flash_fwd_padded(
        qm, km, vm, scale=scale, sq=sq, skv=skv, causal=causal,
        interpret=interpret, block_q=block_q, block_kv=block_kv, g=g,
    )
    out = om[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out, (qm, km, vm, om, lse, (b, sq, h, d, skv))


@functools.lru_cache(maxsize=None)
def _partitioned_bwd_dq(scale, skv, causal, interpret, block_q, block_kv,
                        g):
    def impl_factory():
        def impl(qm, km, vm, dom, lse, delta):
            return _bwd_dq_impl(
                qm, km, vm, dom, lse, delta, scale=scale, skv=skv,
                causal=causal, interpret=interpret, block_q=block_q,
                block_kv=block_kv, g=g,
            )

        return impl

    return _shard_dim0_partitioning(
        impl_factory,
        "m s d, m t d, m t d, m s d, m s y, m s z -> m s d",
        n_in=6, n_out=1,
    )


@functools.lru_cache(maxsize=None)
def _partitioned_bwd_dkv(scale, skv, causal, interpret, block_q, block_kv,
                         g):
    def impl_factory():
        def impl(qm, km, vm, dom, lse, delta):
            return _bwd_dkv_impl(
                qm, km, vm, dom, lse, delta, scale=scale, skv=skv,
                causal=causal, interpret=interpret, block_q=block_q,
                block_kv=block_kv, g=g,
            )

        return impl

    return _shard_dim0_partitioning(
        impl_factory,
        "m s d, m t d, m t d, m s d, m s y, m s z -> m t d, m t d",
        n_in=6, n_out=2,
    )


# The backward kernels carry three extra operand streams (do, lse, delta)
# on top of the forward's fitted per-head budget: at bs4/S=1024/h4 (bq 512,
# bkv 256) the dq kernel's scoped stack measured 16.36M where the forward
# fit predicts 15.73M — a real-chip OOM by 372K at the forward's g=4 pick
# (round 4; pre-existing at any bh=16 S=1024 grad shape).  Picking against
# a 14 MiB budget drops that shape to g=2 (8.2M, compiles; 15 MiB is
# exactly 4x the fitted per-head cost, so it would still pick g=4) and
# leaves every
# measured-green backward choice (e.g. S=2048 bs8, g=2) unchanged.
_BWD_VMEM_BUDGET = 14 << 20


def _bwd_g(qm, km, g, block_q, block_kv, d):
    bh = qm.shape[0]
    sq_pad, skv_pad = qm.shape[1], km.shape[1]
    # g was already validated in the forward (the custom-VJP forward always
    # runs first with the same bh)
    return g or _heads_per_cell(bh, max(skv_pad, sq_pad), d, block_q,
                                block_kv, budget=_BWD_VMEM_BUDGET)


def _bwd_dq_impl(qm, km, vm, dom, lse, delta, *, scale, skv, causal,
                 interpret, block_q, block_kv, g):
    bh = qm.shape[0]
    sq_pad, skv_pad = qm.shape[1], km.shape[1]
    d = qm.shape[2]
    g = _bwd_g(qm, km, g, block_q, block_kv, d)
    kw = dict(scale=scale, kv_len=skv, causal=causal)
    return pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_kv=block_kv, **kw),
        grid=(bh // g, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((g, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((g, skv_pad, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((g, skv_pad, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((g, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((g, block_q, 1), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((g, block_q, 1), lambda bh, iq: (bh, iq, 0)),
        ],
        out_specs=pl.BlockSpec((g, block_q, d), lambda bh, iq: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), qm.dtype),
        interpret=interpret,
    )(qm, km, vm, dom, lse, delta)


def _bwd_dkv_impl(qm, km, vm, dom, lse, delta, *, scale, skv, causal,
                  interpret, block_q, block_kv, g):
    bh = qm.shape[0]
    sq_pad, skv_pad = qm.shape[1], km.shape[1]
    d = qm.shape[2]
    g = _bwd_g(qm, km, g, block_q, block_kv, d)
    kw = dict(scale=scale, kv_len=skv, causal=causal)
    return pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, **kw),
        grid=(bh // g, skv_pad // block_kv),
        in_specs=[
            pl.BlockSpec((g, sq_pad, d), lambda bh, jk: (bh, 0, 0)),
            pl.BlockSpec((g, block_kv, d), lambda bh, jk: (bh, jk, 0)),
            pl.BlockSpec((g, block_kv, d), lambda bh, jk: (bh, jk, 0)),
            pl.BlockSpec((g, sq_pad, d), lambda bh, jk: (bh, 0, 0)),
            pl.BlockSpec((g, sq_pad, 1), lambda bh, jk: (bh, 0, 0)),
            pl.BlockSpec((g, sq_pad, 1), lambda bh, jk: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, block_kv, d), lambda bh, jk: (bh, jk, 0)),
            pl.BlockSpec((g, block_kv, d), lambda bh, jk: (bh, jk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv_pad, d), km.dtype),
            jax.ShapeDtypeStruct((bh, skv_pad, d), vm.dtype),
        ],
        interpret=interpret,
    )(qm, km, vm, dom, lse, delta)


def _flash_bwd_rule(causal, interpret, block_q, block_kv, g, res, grad):
    qm, km, vm, om, lse, (b, sq, h, d, skv) = res
    scale = d ** -0.5
    sq_pad = qm.shape[1]
    dom = _merge_pad(grad, b, h, d, sq_pad)
    delta = jnp.sum(
        dom.astype(jnp.float32) * om.astype(jnp.float32), axis=-1, keepdims=True
    )

    dqm = _partitioned_bwd_dq(
        scale, skv, causal, interpret, block_q, block_kv, g
    )(qm, km, vm, dom, lse, delta)
    dkm, dvm = _partitioned_bwd_dkv(
        scale, skv, causal, interpret, block_q, block_kv, g
    )(qm, km, vm, dom, lse, delta)

    def unmerge(xm, s):
        return xm[:, :s, :].reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unmerge(dqm, sq), unmerge(dkm, skv), unmerge(dvm, skv)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "interpret", "block_q", "block_kv", "heads_per_cell"
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    heads_per_cell: Optional[int] = None,
) -> jax.Array:
    """Fused attention: q [B, Sq, H, D], k/v [B, Skv, H, D] -> [B, Sq, H, D].

    ``interpret=None`` (default) resolves by backend: compiled Mosaic on
    TPU, Pallas interpret mode elsewhere — so explicit ``impl="pallas"``
    calls work (slowly but correctly) on CPU instead of failing in the
    Mosaic lowering.  Pass an explicit bool to pin the mode (the profiling
    scripts pin ``False``; the kernel unit tests pin ``True``).

    Block sizes default to the measured per-shape choice (``_pick_blocks``);
    pass ``block_q``/``block_kv`` to override (both must divide their padded
    sequence).  ``heads_per_cell`` overrides the VMEM-budgeted head-packing
    factor (``_heads_per_cell``) for both passes; it is a STATIC argument
    precisely so tuning probes get a fresh trace per value (a patched
    module global is silently ignored after the first trace — the jit-cache
    measurement trap).

    Differentiable: the backward pass is the standard flash-attention
    recomputation (blockwise dQ and dK/dV kernels over the saved row
    logsumexp), so gradients never materialize the [B, H, Sq, Skv] score
    tensor either — encoder fine-tuning works at context lengths where the
    XLA backward cannot exist.
    """
    if mask is not None:
        # a stripped assert (python -O) would silently DROP the mask —
        # raise unconditionally instead
        raise ValueError("additive masks use the XLA path")
    if interpret is None:
        from debiasing_multi_modal_tpu.ops.attention import _on_tpu

        interpret = not _on_tpu()
    auto_q, auto_kv = _pick_blocks(q.shape[1], k.shape[1])
    return _flash(
        q, k, v, causal, interpret, block_q or auto_q, block_kv or auto_kv,
        heads_per_cell,
    )
