"""Ring attention: sequence-parallel attention over a mesh axis.

The reference has no distributed construct at all (SURVEY.md §2.9 —
single-GPU CUDA everywhere); this module is the TPU-native capability its
long-context story needs at pod scale.  The flash kernel
(:mod:`debiasing_multi_modal_tpu.ops.flash_attention`) owns the
prohibitive-score regime on ONE chip, and its SPMD rule shards batch*heads
— but the sequence axis must be replicated there, so a context too long
for one chip's HBM has no home.  Ring attention shards the SEQUENCE axis
across the mesh: each device holds one q/k/v chunk, computes blockwise
attention of its q chunk against the kv chunk it currently holds, and the
kv chunks rotate around the ring via ``ppermute`` (ICI neighbor traffic,
no all-gather) while an online-softmax accumulator merges partials —
exactly the flash recurrence, distributed.

Layout contract matches flash_attention: q/k/v ``[B, S, H, D]`` with S
sharded over the given mesh axis.  Use :func:`ring_attention` inside
``shard_map`` (it operates on the local chunks and needs the axis name),
or :func:`sequence_parallel_attention` for the jit-level wrapper that sets
up the shard_map over a mesh.

Causality is computed from GLOBAL positions (chunk index * chunk length +
local offset), so the causal variant is exact, not per-chunk approximate.
Differentiable via a custom VJP that runs a SECOND ring (the standard
ring-attention backward): k/v/dk/dv co-rotate so every gradient
accumulator lands back on its home device after n hops, and the exact
per-chunk softmax is recovered from the saved logsumexp.  This is the
memory-true choice — plain jax.grad through the forward scan would
checkpoint each step's rotating carry, materializing the FULL global k/v
on every device.  Gradients are parity-tested against the XLA formulation
on an 8-device CPU mesh and across a real 2-process boundary
(tests/test_ring_attention.py, tests/multihost_worker.py).

Reference parity surface: none (capability absent in /root/reference —
deliberate TPU-native extension, PARITY.md §5.7/§5.8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_NEG_INF = float(-1e30)


def _causal_add(sl, idx, src):
    q_pos = idx * sl + jax.lax.iota(jnp.int32, sl)
    kv_pos = src * sl + jax.lax.iota(jnp.int32, sl)
    mask = kv_pos[None, :] <= q_pos[:, None]  # [sq, skv]
    return jnp.where(mask[None, None], 0.0, _NEG_INF)


def _ring_forward(q, k, v, axis_name, causal):
    """Forward ring; returns (out, lse) with lse = m + log(l), [b, h, sl]."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, sl, h, d = q.shape
    scale = d ** -0.5
    perm = [(j, (j + 1) % n) for j in range(n)]

    q32 = q.astype(jnp.float32) * scale

    def partial_attn(kc, vc, src):
        # logits of the local q chunk against one kv chunk, f32
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q32, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if causal:
            logits = logits + _causal_add(sl, idx, src)
        m = jnp.max(logits, axis=-1)  # [b, h, sq]
        e = jnp.exp(logits - m[..., None])
        l = jnp.sum(e, axis=-1)  # [b, h, sq]
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", e.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32,
        )
        return pv, m, l

    def step(carry, i):
        acc, m, l, kc, vc = carry
        src = (idx - i) % n  # global chunk id the rotating kv currently is
        pv, m_i, l_i = partial_attn(kc, vc, src)
        # online softmax merge (the flash recurrence across ring steps);
        # m/l are [b, h, sq] — move to [b, sq, h, 1] to scale pv
        m_new = jnp.maximum(m, m_i)
        a_old = jnp.exp(m - m_new)
        a_new = jnp.exp(m_i - m_new)
        def bc(x):  # [b, h, sq] -> [b, sq, h, 1]
            return x.transpose(0, 2, 1)[..., None]
        acc = acc * bc(a_old) + pv * bc(a_new)
        l = l * a_old + l_i * a_new
        # rotate the kv chunks one hop around the ring (neighbor ICI)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (acc, m_new, l, kc, vc), None

    # zero inits are derived FROM q so they inherit its full device-varying
    # axis set (shard_map's varying-manual-axes check rejects unvarying
    # carries, and pcast over axis_name alone breaks on dp x sp meshes
    # where q also varies over the batch axis); the 0*q terms fuse away
    zero_bhs = jnp.transpose(q[..., 0] * 0, (0, 2, 1)).astype(jnp.float32)
    acc0 = jnp.zeros((b, sl, h, d), jnp.float32) + 0.0 * q.astype(jnp.float32)
    m0 = zero_bhs + _NEG_INF
    l0 = zero_bhs
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), jnp.arange(n)
    )
    l = jnp.maximum(l, 1e-30)  # fully-masked rows (never in valid causal use)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype), m + jnp.log(l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
) -> jax.Array:
    """Local-chunk ring attention; call inside ``shard_map``.

    Args:
      q, k, v: LOCAL sequence chunks ``[B, S_local, H, D]`` (the global
        sequence is ``axis_size * S_local``, contiguously chunked in ring
        order).
      axis_name: the mesh axis the sequence is sharded over.
      causal: exact global causal masking.

    Returns:
      The local output chunk ``[B, S_local, H, D]`` in q.dtype.

    Memory-true in BOTH passes: the custom VJP runs a second ring (the
    standard ring-attention backward) whose residuals are the local q/k/v
    chunks plus the [b, h, sl] logsumexp — NOT the rotated kv stream.
    Plain jax.grad through the forward scan would checkpoint every step's
    carry, i.e. materialize the FULL global k/v on every device and defeat
    the point of sequence parallelism.
    """
    return _ring_forward(q, k, v, axis_name, causal)[0]


def _ring_fwd(q, k, v, axis_name, causal):
    out, lse = _ring_forward(q, k, v, axis_name, causal)
    return out, (q, k, v, out, lse)


def _ring_bwd(axis_name, causal, res, dout):
    q, k, v, out, lse = res
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, sl, h, d = q.shape
    scale = d ** -0.5
    perm = [(j, (j + 1) % n) for j in range(n)]

    q32 = q.astype(jnp.float32)
    do32 = dout.astype(jnp.float32)
    # delta_i = sum_d dout * out  (the softmax-normalization pullback term)
    delta = jnp.einsum("bqhd,bqhd->bhq", do32, out.astype(jnp.float32))

    def step(carry, i):
        dq, kc, vc, dkc, dvc = carry
        src = (idx - i) % n
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q32 * scale, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if causal:
            logits = logits + _causal_add(sl, idx, src)
        # exact softmax row via the saved global logsumexp
        p = jnp.exp(logits - lse[..., None])  # [b, h, sq, skv]
        dvc = dvc + jnp.einsum(
            "bhqk,bqhd->bkhd", p, do32, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "bqhd,bkhd->bhqk", do32, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum(
            "bhqk,bkhd->bqhd", ds, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dkc = dkc + jnp.einsum(
            "bhqk,bqhd->bkhd", ds, q32, preferred_element_type=jnp.float32
        )
        # the gradient accumulators co-rotate with their kv chunks, so
        # after n hops each lands back on its home device
        kc, vc, dkc, dvc = (
            jax.lax.ppermute(x, axis_name, perm) for x in (kc, vc, dkc, dvc)
        )
        return (dq, kc, vc, dkc, dvc), None

    dq0 = 0.0 * q32
    dk0 = 0.0 * k.astype(jnp.float32)
    dv0 = 0.0 * v.astype(jnp.float32)
    (dq, _, _, dk, dv), _ = jax.lax.scan(
        step, (dq0, k, v, dk0, dv0), jnp.arange(n)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)


@functools.partial(
    jax.jit, static_argnames=("axis_name", "causal", "mesh", "batch_axis")
)
def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str,
    causal: bool = False,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """jit-level wrapper: shard q/k/v's sequence axis over ``axis_name``
    and run the ring.  The global S must be divisible by the axis size.  Pass
    ``batch_axis`` to also shard the batch dim (dp x sp meshes — the ring
    runs independently within each dp slice); head/D stay replicated."""
    if q.ndim != 4 or q.shape != k.shape or k.shape != v.shape:
        raise ValueError(
            f"sequence_parallel_attention is self-attention over [B,S,H,D]; "
            f"got q{q.shape} k{k.shape} v{v.shape}"
        )
    n = mesh.shape[axis_name]
    if q.shape[1] % n:
        raise ValueError(
            f"global sequence {q.shape[1]} must be divisible by the "
            f"'{axis_name}' axis size {n}"
        )
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"batch {q.shape[0]} must be divisible by the '{batch_axis}' axis size "
            f"{mesh.shape[batch_axis]}"
        )
    spec = PartitionSpec(batch_axis, axis_name, None, None)
    fn = jax.shard_map(
        # custom_vjp functions take positional args only
        lambda q, k, v: ring_attention(q, k, v, axis_name, causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
