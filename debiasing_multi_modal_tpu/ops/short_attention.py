"""Whole-sequence merged-head attention kernel for the short-S regime.

Motivation (measured, round 4 — docs/DESIGN.md §8.8): at CLIP's flagship
shape (ViT-B/32, S=50, batch 1024) the XLA attention path costs 45.5 ms of
the 97.7 ms block stack — ~46% of wall time for ~10% of the FLOPs — because
the [B, H, 50, 50] score tensor lane-pads 50->128 and makes three HBM round
trips (logits write, softmax read+write, PV read), and the head-split
einsums force sublane-crossing relayouts of every q/k/v.  The blockwise
flash kernel (ops/flash_attention.py) cannot recover this regime either: its
8.3x *standalone* win dies in context because its [B, S, H, D] layout
contract costs four transposed copies per attention (DESIGN §5, lesson 1).

This kernel removes both costs at once by changing the layout contract:

- inputs and output stay in the **merged-head [B, S, D] layout the
  surrounding projection GEMMs already produce and consume** — the grid
  slices only the batch axis, so every DMA is a native-layout contiguous
  slab and there is zero transpose glue on either side;
- each grid cell holds a block of images' full q/k/v in VMEM and loops the
  heads as static lane slices, so scores live and die in VMEM in f32 —
  nothing but the [gB, S, D] output ever returns to HBM.

Scope: self-attention (Sq == Skv == S) up to MAX_SEQ_LEN, in two modes by
VMEM cell size (the ``supported()`` gate checks the byte models against
the measured limits): whole-row when a full sequence's cell fits, else
q-tiled — grid (batch, q_tiles) with the FULL k/v slab still resident per
cell, so the softmax stays exact whole-row (no online accumulation) and
causality is global via the tile id.  Measured full-model wins at every
point: text S=77 (+30%), ViT-B S=50/197 (+32%/+31%), ViT-L S=257/577
(+37%/+42%), and the q-tiled ViT-L@448px probe S=1025 (+34%).  The
reference realizes these attentions via torch ``nn.MultiheadAttention``
(/root/reference/clip/model.py:58-91, 171-192); parity is pinned against the
XLA formulation in tests/test_short_attention.py.

Differentiable via custom VJP: the backward recomputes attention with the
plain XLA formulation and takes its gradient (the score tensor fits by
definition in this regime).  Forward-only use (extraction, the frozen CLIP
towers in every trainer path) never touches it.

A lane-packed variant (:func:`short_attention_packed`) consumes the fused
[D, 3D] in-projection GEMM's [B, S, 3D] output directly (head slices at
static lane offsets 0/D/2D — no split copies).  It is the measured-best
implementation of ``fuse_qkv=True``, which itself measured a full-model
null vs the unfused path (XLA already horizontally fuses the three narrow
in-projections — DESIGN §8.8 round 5), so fuse_qkv ships opt-in.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

_NEG_INF = float(-1e30)
# The effective gate is the measured per-image cell limit below (whole-row
# or q-tiled); this policy bound keeps sequences far past the measured
# range (S=50..1297, every point a full-model win — the S=1297 interior
# point is the ViT-L@504px probe, DESIGN §8.8 round 5) on the flash/XLA
# path.
MAX_SEQ_LEN = 1536
# A single image's cell (q/k/v/o slabs + one head's f32 scores) must fit
# Mosaic's ~16 MiB scoped VMEM with margin.  Measured boundary (round 4):
# S=577 D=1024 (8.2 MiB) compiles and wins 1.42x; S=1025 D=1024 (20.4 MiB)
# VMEM-OOMs in Mosaic.  12 MiB separates them with margin on both sides.
CELL_VMEM_LIMIT = 12 << 20
# VMEM budget for one grid cell's resident values (q/k/v/o slabs + f32
# score temporaries), conservative against the ~16 MiB/core scoped limit:
# Mosaic double-buffers the three input DMAs on top of this, and the
# measured stack allocation runs ~2x the naive model (a gb=16 ViT-B/32
# cell modelled at 7.2 MiB compiled to a 16.57 MiB stack and OOMed).
VMEM_BUDGET_BYTES = 6 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cell_bytes(s: int, d: int, heads: int, itemsize: int,
                merge: int = 1) -> int:
    """Per-image VMEM footprint of one grid cell (registers are tiled, so
    count padded shapes: sublanes to the dtype tile, lanes to 128).

    ``merge`` > 1 models the image-merged score layout: m images share one
    block-diagonally masked [m*S, m*S] score matrix (plus the f32 mask
    itself), so the per-image score share grows ~linearly with m while the
    slabs stay put."""
    sub = 16 if itemsize == 2 else 8
    ms = s * merge
    slabs = 4 * _round_up(ms, sub) * _round_up(d, 128) * itemsize // merge
    # f32 logits + exp for one head at a time, plus the bf16 PV operand
    s_l = _round_up(ms, 128)
    scores = 2 * _round_up(ms, 8) * s_l * 4 + _round_up(ms, sub) * s_l * itemsize
    if merge > 1:
        scores += _round_up(ms, 8) * s_l * 4  # the additive block mask
    return slabs + scores // merge


# Probe-only override (read once at import): force the whole-row batch
# block regardless of the byte model, for full-model gb sweeps in separate
# processes (the in-process jit cache would ignore a patched global).
_FORCE_GB = int(os.environ.get("DMT_SHORT_BLOCK_B") or "0")
# Probe-only override for the image-merge factor (same fresh-process
# pattern): merge m images of a cell into one block-diagonally masked
# [m*S, m*S] score matrix so the MXU sees fewer, larger dots and the
# S -> 128 lane padding amortizes over m sequences.  0 = the measured
# auto policy (pick_merge).
_FORCE_MERGE = int(os.environ.get("DMT_SHORT_MERGE") or "0")


def pick_block_b(b: int, s: int, d: int, heads: int, itemsize: int = 2,
                 merge: int = 1) -> int:
    """Largest power-of-two batch block whose cell fits the VMEM budget."""
    if _FORCE_GB:
        return min(_FORCE_GB, b)
    per_img = _cell_bytes(s, d, heads, itemsize, merge)
    # start at ``merge`` (the grid cell must hold at least one merge group;
    # smaller batches just pad up to one cell)
    gb = merge
    while gb < b and 2 * gb * per_img <= VMEM_BUDGET_BYTES:
        gb *= 2
    return gb


def pick_merge(b: int, s: int, d: int, heads: int, itemsize: int = 2) -> int:
    """Measured auto policy for the image-merge factor (power of two; m
    images share one block-diagonally masked [m*S, m*S] score matrix).

    Merging trades fewer/larger MXU dots against extra masked-lane FLOPs
    and VPU softmax work; it could only pay where the lane padding of a
    single image's scores is poor (S well under the 128-lane tile).  It
    does NOT pay: measured FULL-MODEL per §5 (DESIGN §8.8, round 5),
    merge=1 beats m=2/4/8 on every routed surface — ViT-B/32 extraction
    13,523 vs 11,074/10,961/10,457 imgs/s and text encode 18,392 vs
    15,228/15,590/13,720 prompts/s — because the block-diagonal [mS, mS]
    score matrix costs m x the score FLOPs per image, which swamps the
    lane-padding recovery it buys.  merge=1 is the measured policy;
    probes force m via DMT_SHORT_MERGE in fresh processes."""
    if _FORCE_MERGE:
        m = 1
        while m * 2 <= min(_FORCE_MERGE, b):
            m *= 2
        return m
    return 1


def _tiled_cell_bytes(s: int, bq: int, d: int, itemsize: int) -> int:
    """Per-image cell footprint in q-tiled mode: full k/v resident, one
    [bq, d] q/o tile, one head's [bq, s] f32 scores."""
    sub = 16 if itemsize == 2 else 8
    d_r = _round_up(d, 128)
    kv = 2 * _round_up(s, sub) * d_r * itemsize
    qo = 2 * _round_up(bq, sub) * d_r * itemsize
    s_l = _round_up(s, 128)
    scores = 2 * _round_up(bq, 8) * s_l * 4 + _round_up(bq, sub) * s_l * itemsize
    return kv + qo + scores


# The tiled mode's measured compile-to-model stack ratio is ~1.32x (a
# bq=512 S=1025 D=1024 cell modelled at 12.26M compiled to a 16.18M stack
# and OOMed the 16M scoped limit inside the full ViT-L@448 encode), so its
# pick uses a tighter limit than the whole-row mode's: 10 MiB * 1.32 stays
# under 14M with margin.
TILED_CELL_LIMIT = 10 << 20


def pick_block_q(s: int, d: int, itemsize: int = 2) -> Optional[int]:
    """Largest q tile (512/256/128) whose tiled cell fits the VMEM limit,
    or None when even bq=128 does not fit (hand the shape to flash/XLA)."""
    for bq in (512, 256, 128):
        if _tiled_cell_bytes(s, bq, d, itemsize) <= TILED_CELL_LIMIT:
            return bq
    return None


def supported(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
              *, mask: Optional[jax.Array] = None) -> bool:
    """Gate: merged-head self-attention whose VMEM cell fits — whole-row
    for short S, q-tiled (full kv resident, exact whole-row softmax) for
    longer S up to MAX_SEQ_LEN."""
    if mask is not None:
        return False
    if q.ndim != 3 or q.shape != k.shape or k.shape != v.shape:
        return False
    b, s, d = q.shape
    if not (1 < s <= MAX_SEQ_LEN):
        return False
    if d % num_heads or d % 128:
        return False
    if _cell_bytes(s, d, num_heads, q.dtype.itemsize) <= CELL_VMEM_LIMIT:
        return True
    return pick_block_q(s, d, q.dtype.itemsize) is not None


def supported_packed(qkv: jax.Array, num_heads: int) -> bool:
    """Gate for the lane-packed variant: qkv [B, S, 3D] (q | k | v along
    lanes — the fused in-projection GEMM's output layout), whole-row mode
    only (every packed-routed tower is whole-row; q-tiled shapes fall back
    to the split path)."""
    if qkv.ndim != 3:
        return False
    b, s, d3 = qkv.shape
    if d3 % 3:
        return False
    d = d3 // 3
    if not (1 < s <= MAX_SEQ_LEN):
        return False
    if d % num_heads or d % 128:
        return False
    return _cell_bytes(s, d, num_heads, qkv.dtype.itemsize) <= CELL_VMEM_LIMIT


def _short_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                       scale: float, causal: bool, merge: int = 1):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    gb, s, d = q.shape
    hd = d // heads
    # merge > 1: fold m images into one [m*S, m*S] block-diagonally masked
    # score matrix — fewer, larger MXU dots, and the S -> 128 lane padding
    # amortizes over m sequences.  Masked lanes exp to exactly 0.0 in f32,
    # so the math is the per-image math up to f32 reduction order (the
    # softmax sum and PV dot contract over m*S lanes; measured <=1 bf16
    # ulp vs merge=1).
    ms = s * merge
    if merge > 1:
        q = q.reshape(gb // merge, ms, d)
        k = k.reshape(gb // merge, ms, d)
        v = v.reshape(gb // merge, ms, d)
    if causal or merge > 1:
        row = jax.lax.broadcasted_iota(jnp.int32, (ms, ms), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ms, ms), 1)
        ok = (row // s) == (col // s) if merge > 1 else col <= row
        if causal and merge > 1:
            ok = jnp.logical_and(ok, col <= row)
        mask_add = jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * hd, (h + 1) * hd, axis=2)
        kh = jax.lax.slice_in_dim(k, h * hd, (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(v, h * hd, (h + 1) * hd, axis=2)
        # [gB/m, mS, mS] logits, f32, never leaving VMEM
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal or merge > 1:
            logits = logits + mask_add[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            w.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if merge > 1:
            oh = oh.reshape(gb, s, hd)
        # write each head straight into its output lane slice — holding all
        # H chunks for one concat keeps H lane-padded [gB, S, 128] values
        # live at once and was the dominant term of the gb=16 VMEM OOM
        o_ref[:, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)


def _packed_attn_kernel(qkv_ref, o_ref, *, heads: int, scale: float,
                        causal: bool, d: int):
    """Whole-row kernel over ONE lane-packed [gB, S, 3D] input slab.

    Identical math to :func:`_short_attn_kernel` (merge=1); the only
    difference is where the head slices come from — static lane offsets
    0 / D / 2D into the packed slab instead of three separate refs.  This
    lets the fused [D, 3D] in-projection GEMM's output feed the kernel
    directly: no ``jnp.split`` materializes three [B, S, D] copies in HBM
    (the split tax measured -14% full-model, DESIGN §8.8 round 5)."""
    qkv = qkv_ref[...]
    gb, s, _ = qkv.shape
    hd = d // heads
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask_add = jnp.where(col <= row, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(heads):
        qh = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        kh = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(
            qkv, 2 * d + h * hd, 2 * d + (h + 1) * hd, axis=2
        )
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            logits = logits + mask_add[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            w.astype(qkv.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)


def _qtiled_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float,
                   causal: bool, block_q: int):
    """q-tiled variant: grid (batch, q_tiles); the full k/v slab is
    resident per cell so the softmax is still exact whole-row (no online
    accumulation).  Causality uses GLOBAL q positions from the tile id."""
    q = q_ref[...]   # [gb, bq, d]
    k = k_ref[...]   # [gb, S, d]
    v = v_ref[...]
    s, d = k.shape[1], k.shape[2]
    bq = q.shape[1]
    hd = d // heads
    if causal:
        q0 = pl.program_id(1) * block_q
        row = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
        causal_add = jnp.where(col <= row, 0.0, _NEG_INF).astype(jnp.float32)
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * hd, (h + 1) * hd, axis=2)
        kh = jax.lax.slice_in_dim(k, h * hd, (h + 1) * hd, axis=2)
        vh = jax.lax.slice_in_dim(v, h * hd, (h + 1) * hd, axis=2)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [gb, bq, S]
        if causal:
            logits = logits + causal_add[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            w.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)


def _xla_merged(q, k, v, num_heads, causal):
    """Plain merged-head XLA attention — the VJP recomputation target and
    the numerics oracle for the kernel tests (mirrors ops/attention.py's
    _xla_attention modulo the bf16 logit-storage rounding, which the kernel
    does not need: its logits stay f32 in VMEM for free)."""
    b, s, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, s, num_heads, hd)
    kh = k.reshape(b, s, num_heads, hd)
    vh = v.reshape(b, s, num_heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where(col <= row, logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w.astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(b, s, d)


def _pallas_forward(q, k, v, num_heads, causal, interpret, block_b, scale,
                    merge=1):
    """The raw pallas_call on (possibly per-shard) shapes.  ``scale`` is
    passed explicitly because under head (D-axis) sharding the local head
    count changes but the softmax scale must stay the GLOBAL head_dim's.

    Two modes by VMEM cell size: whole-row (the measured S=50..577 winner)
    when a full sequence's cell fits, else q-tiled with the full k/v slab
    still resident (exact softmax, global causality from the tile id).
    ``merge`` applies to the whole-row mode only."""
    b, s, d = q.shape
    itemsize = q.dtype.itemsize
    if _cell_bytes(s, d, num_heads, itemsize) <= CELL_VMEM_LIMIT:
        if merge > 1 and _cell_bytes(s, d, num_heads, itemsize,
                                     merge) > CELL_VMEM_LIMIT:
            merge = 1  # merged cell would not fit; fall back to per-image
        gb = block_b or pick_block_b(b, s, d, num_heads, itemsize, merge)
        while merge > 1 and gb % merge:
            merge //= 2  # an explicit block_b may not hold a merge group
        b_pad = _round_up(b, gb)
        if b_pad != b:
            q, k, v = (jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
                       for x in (q, k, v))
        out = pl.pallas_call(
            functools.partial(
                _short_attn_kernel, heads=num_heads, scale=scale,
                causal=causal, merge=merge,
            ),
            grid=(b_pad // gb,),
            in_specs=[pl.BlockSpec((gb, s, d), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((gb, s, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, s, d), q.dtype),
            interpret=interpret,
        )(q, k, v)
        return out[:b] if b_pad != b else out

    bq = pick_block_q(s, d, itemsize)
    if bq is None:
        raise ValueError(
            f"short_attention cell does not fit VMEM at S={s} D={d} "
            f"(gate supported() should have rejected this shape)"
        )
    gb = block_b or 1
    b_pad = _round_up(b, gb)
    sq_pad = _round_up(s, bq)
    qp = jnp.pad(q, ((0, b_pad - b), (0, sq_pad - s), (0, 0)))
    kp, vp = (jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0))) for x in (k, v))
    out = pl.pallas_call(
        functools.partial(
            _qtiled_kernel, heads=num_heads, scale=scale, causal=causal,
            block_q=bq,
        ),
        grid=(b_pad // gb, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, sq_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:b, :s]


@functools.lru_cache(maxsize=None)
def _partitioned_forward(num_heads: int, causal: bool, interpret: bool,
                         block_b: Optional[int], d: int, merge: int = 1):
    """A custom_partitioning wrapper so the Mosaic kernel works inside a
    multi-device ``jit`` (the production extraction step is a pjit over a dp
    mesh — extract/runner.py; a bare custom call has no SPMD rule and GSPMD
    would replicate it).  The grid slices only the batch axis, so batch
    sharding is free; the D axis may be sharded at head boundaries (each
    shard computes its own heads — the Megatron tp layout of parallel/tp.py);
    S and head_dim must be replicated.  Cached per static config so repeated
    traces reuse one primitive."""
    hd = d // num_heads
    scale = hd ** -0.5

    @custom_partitioning
    def fwd(q, k, v):
        return _pallas_forward(q, k, v, num_heads, causal, interpret,
                               block_b, scale, merge)

    def _normalize(mesh, sharding):
        spec = getattr(sharding, "spec", None)
        if spec is None:
            return NamedSharding(mesh, PartitionSpec(None, None, None))
        spec = tuple(spec) + (None,) * (3 - len(tuple(spec)))
        d_axes = spec[2]
        if d_axes is not None:
            axes = d_axes if isinstance(d_axes, tuple) else (d_axes,)
            shards = 1
            for a in axes:
                shards *= mesh.shape[a]
            # only head-boundary slices are computable shard-locally
            if shards > 1 and num_heads % shards != 0:
                d_axes = None
        return NamedSharding(mesh, PartitionSpec(spec[0], None, d_axes))

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(
            _normalize(mesh, a.sharding) for a in arg_shapes
        )
        # q/k/v must agree for the kernel's shard-local math
        arg_shardings = (arg_shardings[0],) * 3
        result_sharding = arg_shardings[0]

        def lower_fn(q, k, v):
            local_heads = num_heads * q.shape[2] // d
            return _pallas_forward(q, k, v, local_heads, causal, interpret,
                                   block_b, scale, merge)

        return mesh, lower_fn, result_sharding, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _normalize(mesh, arg_shapes[0].sharding)

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="b s (h e), b s (h e), b s (h e) -> b s (h e)",
        need_replication_factors=("s", "e"),
        h=num_heads,
        e=hd,
    )
    return fwd


def _forward(q, k, v, num_heads, causal, interpret, block_b, merge):
    return _partitioned_forward(
        num_heads, causal, interpret, block_b, q.shape[2], merge
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _short(q, k, v, num_heads, causal, interpret, block_b, merge):
    return _forward(q, k, v, num_heads, causal, interpret, block_b, merge)


def _short_fwd(q, k, v, num_heads, causal, interpret, block_b, merge):
    return (_forward(q, k, v, num_heads, causal, interpret, block_b, merge),
            (q, k, v))


def _short_bwd(num_heads, causal, interpret, block_b, merge, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_merged(q, k, v, num_heads, causal),
                     q, k, v)
    return vjp(g)


_short.defvjp(_short_fwd, _short_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "causal", "interpret", "block_b", "merge"),
)
def short_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    causal: bool = False,
    interpret: Optional[bool] = None,
    block_b: Optional[int] = None,
    merge: Optional[int] = None,
) -> jax.Array:
    """Fused short-S attention: q/k/v [B, S, D] merged-head -> [B, S, D].

    ``interpret=None`` resolves by backend like flash_attention: compiled
    Mosaic on TPU, Pallas interpret mode elsewhere.  ``block_b`` overrides
    the VMEM-budgeted batch block (STATIC so tuning probes re-trace);
    ``merge`` the image-merge factor (``None`` = :func:`pick_merge`'s
    measured policy).  Callers should gate on :func:`supported`;
    violations raise here.
    """
    if not supported(q, k, v, num_heads):
        raise ValueError(
            f"short_attention does not support q{q.shape} k{k.shape} "
            f"v{v.shape} heads={num_heads} (see supported())"
        )
    if interpret is None:
        from debiasing_multi_modal_tpu.ops.attention import _on_tpu

        interpret = not _on_tpu()
    if merge is None:
        merge = pick_merge(q.shape[0], q.shape[1], q.shape[2], num_heads,
                           q.dtype.itemsize)
    return _short(q, k, v, num_heads, causal, interpret, block_b, merge)


# ---------------------------------------------------------------------------
# Lane-packed variant: one [B, S, 3D] qkv input (q | k | v along lanes), the
# output layout of the fused [D, 3D] in-projection GEMM (fuse_qkv=True).
# Measured rationale (DESIGN §8.8, round 5): the fused GEMM runs 142 vs
# 3 x 93.5 TF/s standalone, but splitting its output back into three
# [B, S, D] slabs costs an HBM round trip that turned the win into a -14%
# full-model loss.  Consuming the packed slab directly via static lane
# offsets keeps the wide-GEMM rate AND the kernel's zero-glue contract.
# ---------------------------------------------------------------------------


def _pallas_forward_packed(qkv, num_heads, causal, interpret, block_b, scale):
    b, s, d3 = qkv.shape
    d = d3 // 3
    itemsize = qkv.dtype.itemsize
    gb = block_b or pick_block_b(b, s, d, num_heads, itemsize)
    b_pad = _round_up(b, gb)
    if b_pad != b:
        qkv = jnp.pad(qkv, ((0, b_pad - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _packed_attn_kernel, heads=num_heads, scale=scale,
            causal=causal, d=d,
        ),
        grid=(b_pad // gb,),
        in_specs=[pl.BlockSpec((gb, s, d3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((gb, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, s, d), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out[:b] if b_pad != b else out


@functools.lru_cache(maxsize=None)
def _partitioned_forward_packed(num_heads: int, causal: bool,
                                interpret: bool, block_b: Optional[int],
                                d: int):
    """SPMD rule for the packed kernel inside a multi-device jit.  Only the
    batch axis shards (the packed lane axis interleaves q/k/v so a D-axis
    shard is NOT a head-local slice of all three — tensor-parallel runs use
    the split path, which has the head-boundary rule)."""
    scale = (d // num_heads) ** -0.5

    @custom_partitioning
    def fwd(qkv):
        return _pallas_forward_packed(qkv, num_heads, causal, interpret,
                                      block_b, scale)

    def _normalize(mesh, sharding):
        spec = tuple(getattr(sharding, "spec", None) or ())
        batch = spec[0] if spec else None
        return NamedSharding(mesh, PartitionSpec(batch, None, None))

    def partition(mesh, arg_shapes, result_shape):
        arg_sharding = _normalize(mesh, arg_shapes[0].sharding)

        def lower_fn(qkv):
            return _pallas_forward_packed(qkv, num_heads, causal, interpret,
                                          block_b, scale)

        return mesh, lower_fn, arg_sharding, (arg_sharding,)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _normalize(mesh, arg_shapes[0].sharding)

    fwd.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="b s x -> b s y",
        need_replication_factors=("s", "x", "y"),
    )
    return fwd


def _forward_packed(qkv, num_heads, causal, interpret, block_b):
    return _partitioned_forward_packed(
        num_heads, causal, interpret, block_b, qkv.shape[2] // 3
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _short_packed(qkv, num_heads, causal, interpret, block_b):
    return _forward_packed(qkv, num_heads, causal, interpret, block_b)


def _short_packed_fwd(qkv, num_heads, causal, interpret, block_b):
    return (_forward_packed(qkv, num_heads, causal, interpret, block_b),
            (qkv,))


def _short_packed_bwd(num_heads, causal, interpret, block_b, res, g):
    (qkv,) = res

    def ref(packed):
        q, k, v = jnp.split(packed, 3, axis=-1)
        return _xla_merged(q, k, v, num_heads, causal)

    _, vjp = jax.vjp(ref, qkv)
    return vjp(g)


_short_packed.defvjp(_short_packed_fwd, _short_packed_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret", "block_b")
)
def short_attention_packed(
    qkv: jax.Array,
    num_heads: int,
    *,
    causal: bool = False,
    interpret: Optional[bool] = None,
    block_b: Optional[int] = None,
) -> jax.Array:
    """Fused short-S attention over lane-packed qkv [B, S, 3D] -> [B, S, D].

    The packed layout is exactly what the fused [D, 3D] in-projection GEMM
    produces (torch's ``in_proj_weight`` column order: q, k, v); the kernel
    slices heads at static lane offsets so no split copies touch HBM.
    Callers should gate on :func:`supported_packed`; violations raise."""
    if not supported_packed(qkv, num_heads):
        raise ValueError(
            f"short_attention_packed does not support qkv{qkv.shape} "
            f"heads={num_heads} (see supported_packed())"
        )
    if interpret is None:
        from debiasing_multi_modal_tpu.ops.attention import _on_tpu

        interpret = not _on_tpu()
    return _short_packed(qkv, num_heads, causal, interpret, block_b)
