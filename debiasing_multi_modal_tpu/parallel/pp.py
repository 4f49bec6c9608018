"""Pipeline parallelism for the CLIP transformer towers.

The reference is single-device (SURVEY.md §2.9); together with
``parallel/tp.py`` (tensor parallel) and ``ops/ring_attention.py`` /
``ops/ulysses_attention.py`` (the two sequence-parallel flavors) this
completes the pod-scale axis set the reference lacks — and all of the axes
compose HERE, on one mesh (dp x pp x tp x sp).  The
surface being pipelined is the reference's homogeneous transformer stack
(clip/model.py:195-203 ``Transformer`` = N identical
``ResidualAttentionBlock``s), which makes the TPU-native formulation natural:

- **Stacked layers, sharded stages.**  The per-block parameter trees
  (``resblocks_0..L-1``, structurally identical) are stacked into one tree
  with a leading ``[L, ...]`` layer axis and sharded over a ``stage`` mesh
  axis — each device holds ``L / n_stages`` *consecutive* layers.  This is
  the standard JAX/XLA pipelining recipe (scan-over-stacked-layers +
  ``ppermute``), not a port of a torch ``Pipe`` wrapper.
- **GPipe microbatch schedule inside one jit.**  The batch is split into M
  microbatches; a ``lax.scan`` runs ``M + n_stages - 1`` ticks (a scan, not
  ``fori_loop``, so ``jax.grad`` differentiates through the schedule —
  pipeline-parallel training, gradient-parity-pinned).  At tick t
  stage s processes microbatch ``t - s``: stage 0 injects microbatch t,
  every stage runs its local layers (a ``lax.scan`` over the stacked
  subtree), activations rotate to the next stage via ``ppermute`` (neighbor
  ICI traffic only), and the last stage records finished microbatches.  The
  pipeline bubble is the usual ``(n_stages - 1) / (M + n_stages - 1)``.
- **Composes to full 4D on one mesh.**  ``batch_axis`` shards the
  microbatch rows (dp); ``model_axis`` adds Megatron tensor parallelism
  inside each stage (column/row-sharded kernels, local heads, explicit
  psums); ``seq_axis`` shards the sequence and swaps each block's attention
  for ring attention (``ops/ring_attention.py``) or Ulysses all-to-all
  attention (``seq_impl="ulysses"``, ``ops/ulysses_attention.py``) —
  dp x pp x tp x sp in a single jitted program, forward and gradients
  exact vs the sequential stack.  Expert parallelism has no surface here (no MoE layers anywhere
  in the CLIP family — PARITY.md "Deliberate deviations" notes ep as n/a).

Numerics: identical math to the sequential stack — same block module, same
dtype policy; selection is by ``jnp.where`` on the stage index, and the
final broadcast sums a one-hot-by-stage buffer (exact).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from debiasing_multi_modal_tpu.models.layers import (
    ResidualAttentionBlock,
    quick_gelu,
)
from debiasing_multi_modal_tpu.ops.attention import multi_head_attention
from debiasing_multi_modal_tpu.ops.ring_attention import ring_attention
from debiasing_multi_modal_tpu.ops.ulysses_attention import ulysses_attention


def stack_block_params(transformer_params: Any, prefix: str = "resblocks_"):
    """Stack per-layer block subtrees into one ``[L, ...]``-leaved tree.

    ``transformer_params`` is a Transformer params dict with keys
    ``{prefix}{i}`` (the layout ``models/layers.py::Transformer`` creates and
    ``weights/convert.py`` fills from torch checkpoints).  Returns
    ``(stacked_tree, n_layers)``.
    """
    idx = []
    for key in transformer_params:
        if key.startswith(prefix):
            idx.append(int(key[len(prefix):]))
    if not idx:
        raise ValueError(f"no '{prefix}*' blocks in params: "
                         f"{list(transformer_params)}")
    n_layers = max(idx) + 1
    if sorted(idx) != list(range(n_layers)):
        raise ValueError(f"non-contiguous block indices: {sorted(idx)}")
    blocks = [transformer_params[f"{prefix}{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return stacked, n_layers


def _ln_f32(pl, z):
    """LayerNorm in f32 with cast back — matches models/layers.LayerNormF32
    (epsilon 1e-5) on a raw param dict {"scale", "bias"}."""
    zf = z.astype(jnp.float32)
    mu = zf.mean(-1, keepdims=True)
    var = ((zf - mu) ** 2).mean(-1, keepdims=True)
    y = (zf - mu) * jax.lax.rsqrt(var + 1e-5)
    y = y * pl["scale"].astype(jnp.float32) + pl["bias"].astype(jnp.float32)
    return y.astype(z.dtype)


# compiled pipeline programs, keyed by every input that shapes the trace —
# repeated pipeline_transformer calls (per-batch encode loops) reuse the
# SAME jit object and hit its executable cache instead of re-tracing and
# re-paying the ~10 s tunnel compile each call (§7).  Entries are one jit
# wrapper each; real workloads produce a handful.
_PROGRAM_CACHE: dict = {}


def validate_pp(n_layers: int, n_stages: int, batch: int, microbatches: int):
    if n_layers % n_stages:
        raise ValueError(
            f"pipeline stages {n_stages} must divide the {n_layers} layers"
        )
    if microbatches < 1 or batch % microbatches:
        raise ValueError(
            f"microbatches {microbatches} must divide the batch {batch}"
        )


def pipeline_transformer(
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    num_heads: int,
    causal: bool = False,
    microbatches: int = 1,
    stage_axis: str = "stage",
    batch_axis: Optional[str] = None,
    model_axis: Optional[str] = None,
    seq_axis: Optional[str] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    seq_impl: str = "ring",
    remat: bool = False,
) -> jax.Array:
    """Run the stacked transformer over ``x`` [B, S, D] pipeline-parallel.

    ``stacked_params`` is ``stack_block_params``'s tree (leading layer axis),
    sharded over ``stage_axis`` — consecutive layers per stage.  Returns the
    stack's output, replicated over ``stage_axis`` (and sharded over
    ``batch_axis`` if given, for dp x pp meshes).

    Each call builds (and jits) its own program; for repeated steady-state
    calls wrap the CALLER in ``jax.jit`` — the inner jit inlines and the
    outer one caches across calls.

    ``model_axis`` adds Megatron tensor parallelism INSIDE each stage (full
    3D: dp x pp x tp on one mesh): q/k/v and ``c_fc`` kernels column-shard
    over it, ``out_proj``/``c_proj`` row-shard, and the block forward runs
    manually with local heads and one ``psum`` per row-parallel projection
    (the same f/g pattern ``parallel/tp.py`` expresses as PartitionSpecs for
    XLA's partitioner — here explicit, because inside ``shard_map`` the
    collectives are ours to place).

    ``seq_axis`` additionally shards the sequence dimension and runs each
    block's attention sequence-parallel over that axis, making the full 4D
    dp x pp x tp x sp program: LayerNorm and the MLP are position-wise and
    compose with S-sharding for free; only attention needs a collective —
    ``seq_impl="ring"`` (default; kv chunks rotate by ``ppermute``,
    online-softmax merge, never materializes full S) or ``"ulysses"``
    (two all-to-alls exchange heads<->sequence, plain local softmax;
    needs local heads divisible by the axis).
    """
    n_stages = mesh.shape[stage_axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    validate_pp(n_layers, n_stages, x.shape[0], microbatches)
    if batch_axis is not None and (x.shape[0] // microbatches) % mesh.shape[batch_axis]:
        raise ValueError(
            f"microbatch rows {x.shape[0] // microbatches} must be divisible "
            f"by the '{batch_axis}' axis size {mesh.shape[batch_axis]}"
        )
    tp = 1 if model_axis is None else mesh.shape[model_axis]
    if num_heads % tp:
        raise ValueError(
            f"model axis size {tp} must divide the {num_heads} attention heads"
        )
    sp = 1 if seq_axis is None else mesh.shape[seq_axis]
    if x.shape[1] % sp:
        raise ValueError(
            f"sequence {x.shape[1]} must be divisible by the '{seq_axis}' "
            f"axis size {sp}"
        )
    if seq_impl not in ("ring", "ulysses"):
        raise ValueError(f"unknown seq_impl {seq_impl!r}; known: ring, ulysses")
    if seq_impl == "ulysses" and (num_heads // tp) % sp:
        raise ValueError(
            f"ulysses needs local heads {num_heads // tp} divisible by the "
            f"'{seq_axis}' axis size {sp}"
        )

    block = ResidualAttentionBlock(
        num_heads,
        causal=causal,
        dtype=dtype,
        param_dtype=param_dtype,
        attn_impl=attn_impl,
    )
    m = microbatches

    def _tp_block(p, h):
        # manual tp-aware block forward: must match ResidualAttentionBlock
        # (models/layers.py) with column/row-sharded kernels and local heads
        ln = _ln_f32

        def dense(pd, z):
            return (
                jnp.matmul(z.astype(dtype), pd["kernel"].astype(dtype))
                + pd["bias"].astype(dtype)
            )

        def row_parallel(pd, z):
            # kernel input-sharded: partial products, one psum, bias once
            part = jnp.matmul(z.astype(dtype), pd["kernel"].astype(dtype))
            if model_axis is not None:
                part = jax.lax.psum(part, model_axis)
            return part + pd["bias"].astype(dtype)

        hn = ln(p["ln_1"]["ln"], h)
        q = dense(p["attn"]["q_proj"], hn)
        k = dense(p["attn"]["k_proj"], hn)
        v = dense(p["attn"]["v_proj"], hn)
        heads_local = num_heads // tp
        if seq_axis is None:
            o = multi_head_attention(
                q, k, v, heads_local, causal=causal, impl=attn_impl
            )
        else:
            # S is sharded: attention must see the global sequence — ring
            # attention over seq_axis (head-split [B, S_local, H, Dh] layout)
            b, sl, dl = q.shape
            qh, kh, vh = (
                z.reshape(b, sl, heads_local, dl // heads_local)
                for z in (q, k, v)
            )
            if seq_impl == "ring":
                o = ring_attention(qh, kh, vh, seq_axis, causal)
            else:
                o = ulysses_attention(qh, kh, vh, seq_axis, causal)
            o = o.reshape(b, sl, dl)
        h = h + row_parallel(p["attn"]["out_proj"], o)
        hn = ln(p["ln_2"]["ln"], h)
        hh = quick_gelu(dense(p["mlp"]["c_fc"], hn))
        return h + row_parallel(p["mlp"]["c_proj"], hh)

    def _run_local(params_local, h):
        def apply_one(p, h):
            if model_axis is None and seq_axis is None:
                return block.apply({"params": p}, h)
            return _tp_block(p, h)

        if remat:
            # memory-true training: the backward recomputes each layer's
            # activations instead of checkpointing every scan carry
            apply_one = jax.checkpoint(apply_one)

        def body(h, p):
            return apply_one(p, h), None

        h, _ = jax.lax.scan(body, h, params_local)
        return h

    def _pipeline(params_local, x_mb):
        # x_mb: [M, mb, S, D] local rows; params_local: [L/n_stages, ...]
        stage = jax.lax.axis_index(stage_axis)
        ticks = m + n_stages - 1
        out = jnp.zeros_like(x_mb)
        carry = jnp.zeros_like(x_mb[0])
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(state, t):
            # scan (not fori_loop) so the schedule is reverse-differentiable:
            # jax.grad through the pipeline trains THROUGH pp-sharded layers
            carry, out = state
            inject = x_mb[jnp.minimum(t, m - 1)]
            h = jnp.where(stage == 0, inject, carry)
            y = _run_local(params_local, h)
            oidx = t - (n_stages - 1)
            write = (stage == n_stages - 1) & (oidx >= 0)
            safe = jnp.maximum(oidx, 0)
            out = out.at[safe].set(jnp.where(write, y, out[safe]))
            carry = jax.lax.ppermute(y, stage_axis, perm)
            return (carry, out), None

        (carry, out), _ = jax.lax.scan(
            tick, (carry, out), jnp.arange(ticks, dtype=jnp.int32)
        )
        # outputs live on the last stage only; one-hot psum replicates them
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)),
            stage_axis,
        )
        return out

    if model_axis is None:
        param_spec = jax.tree.map(lambda _: P(stage_axis), stacked_params)
    else:
        # tp.py's column/row rules, with the stacked layer axis prepended
        from debiasing_multi_modal_tpu.parallel.tp import _leaf_spec, _path_names

        param_spec = jax.tree_util.tree_map_with_path(
            lambda path, leaf: P(
                stage_axis, *_leaf_spec(_path_names(path), model_axis)
            ),
            stacked_params,
        )
    x_spec = P(None, batch_axis, seq_axis, None)
    mb = x.shape[0] // m
    x_mb = x.reshape(m, mb, *x.shape[1:])
    cache_key = (
        mesh, stage_axis, batch_axis, model_axis, seq_axis, seq_impl,
        causal, num_heads, dtype, param_dtype, attn_impl, remat, m,
        jax.tree.structure(stacked_params),
        tuple(
            (tuple(leaf.shape), str(leaf.dtype))
            for leaf in jax.tree.leaves(stacked_params)
        ),
        tuple(x_mb.shape), str(x.dtype),
    )
    fn = _PROGRAM_CACHE.get(cache_key)
    if fn is None:
        # jit the shard_map: remat's closed_call requires it, and callers
        # get one compiled program either way (outer jits inline this one)
        fn = jax.jit(
            jax.shard_map(
                _pipeline,
                mesh=mesh,
                in_specs=(param_spec, x_spec),
                out_specs=x_spec,
                check_vma=False,
            )
        )
        _PROGRAM_CACHE[cache_key] = fn
    out = fn(stacked_params, x_mb)
    return out.reshape(x.shape)


def _check_tower_supported(clip_model, pp_kwargs):
    """The pipelined encodes run the plain bf16/fp32 block math; a model
    built with quant or fuse_qkv has an IDENTICAL param tree (by design,
    models/layers.py), so without this guard it would silently run
    non-quantized/unfused math instead of failing loudly."""
    quant = getattr(clip_model, "quant", "none")
    if quant != "none":
        raise ValueError(
            f"pipelined encodes do not support quant={quant!r} towers "
            "(the stacked block math is the default-precision path)"
        )
    if getattr(clip_model, "fuse_qkv", False):
        raise ValueError(
            "pipelined encodes do not support fuse_qkv towers "
            "(the stacked block math uses the unfused projections)"
        )
    # these are taken from the model/config — a duplicate in pp_kwargs
    # would otherwise surface as a confusing 'multiple values' TypeError
    clash = {"num_heads", "dtype", "causal"} & set(pp_kwargs)
    if clash:
        raise TypeError(
            f"{sorted(clash)} are fixed by the tower encode (taken from the "
            "model/config); remove them from the keyword arguments"
        )
    # inherit the model's attention dispatch unless the caller overrides
    pp_kwargs.setdefault("attn_impl", getattr(clip_model, "attn_impl", "auto"))


def pipelined_vit_encode(clip_model, variables, images, *, mesh,
                         stacked=None, **pp_kwargs):
    """Full ViT tower encode with the transformer stack pipelined.

    Mirrors ``models/vit.py::VisionTransformer.__call__`` (reference
    clip/model.py:206-240) outside the module — patchify GEMM, class token,
    positional embedding, ln_pre — then runs the stack through
    ``pipeline_transformer`` (any of its dp/tp/sp axes), then ln_post and
    the class-token projection.  Parity vs ``encode_image`` is pinned in
    ``test_pp.py``.  ``images``: CLIP-normalized [N, H, W, 3] floats.
    """
    _check_tower_supported(clip_model, pp_kwargs)
    cfg = clip_model.config
    dtype = cfg.dtype  # the module's own compute dtype (models/clip.py)
    vp = variables["params"]["visual"]
    x = images.astype(dtype)
    n, h, w, c = x.shape
    p = cfg.vision_patch_size
    gh, gw = h // p, w // p
    patches = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(n, gh * gw, p * p * c)
    tokens = patches @ vp["patch_kernel"].astype(dtype)
    width = tokens.shape[-1]
    cls = vp["class_embedding"].astype(dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(cls, (n, 1, width)), tokens], axis=1
    )
    tokens = tokens + vp["positional_embedding"].astype(dtype)
    tokens = _ln_f32(vp["ln_pre"]["ln"], tokens)

    if stacked is None:
        # steady-state loops should pre-stack once (stack_block_params) and
        # pass it in — re-stacking copies the whole transformer tree per call
        stacked, _ = stack_block_params(vp["transformer"])
    tokens = pipeline_transformer(
        stacked, tokens, mesh=mesh, num_heads=cfg.vision_heads,
        dtype=dtype, **pp_kwargs,
    )

    cls_out = _ln_f32(vp["ln_post"]["ln"], tokens[:, 0])
    return cls_out @ vp["proj"].astype(cls_out.dtype)


def pipelined_text_encode(clip_model, variables, token_ids, *, mesh,
                          stacked=None, **pp_kwargs):
    """Full text tower encode with the (causal) stack pipelined.

    Mirrors ``models/text.py::TextTransformer.__call__`` (reference
    clip/model.py:343-356): token + positional embedding, causal pipelined
    stack, ln_final, one-hot EOT gather, text projection.
    """
    _check_tower_supported(clip_model, pp_kwargs)
    cfg = clip_model.config
    dtype = cfg.dtype
    tw = variables["params"]["text"]
    table = tw["token_embedding"]["embedding"].astype(dtype)
    x = jnp.take(table, token_ids, axis=0)
    x = x + tw["positional_embedding"].astype(dtype)

    if stacked is None:
        stacked, _ = stack_block_params(tw["transformer"])
    x = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=cfg.transformer_heads, causal=True,
        dtype=dtype, **pp_kwargs,
    )

    x = _ln_f32(tw["ln_final"]["ln"], x)
    eot_pos = jnp.argmax(token_ids, axis=-1)
    onehot = jax.nn.one_hot(eot_pos, token_ids.shape[-1], dtype=x.dtype)
    feats = jnp.einsum("ns,nsd->nd", onehot, x)
    return feats @ tw["text_projection"].astype(feats.dtype)
