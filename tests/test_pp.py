"""Pipeline parallelism (parallel/pp.py) on the virtual 8-device mesh.

The reference has no distribution at all (SURVEY.md §2.9); these tests pin
the third pod-scale axis (after tp and ring sp): the reference's homogeneous
transformer stack (clip/model.py:195-203) stacked along a layer axis, sharded
over pipeline stages, and driven by a GPipe microbatch schedule inside one
jit.  Requirements: (a) the stacked layout round-trips the real tower param
tree, (b) the pipelined output equals the sequential stack exactly, for any
microbatch count and causal mode, (c) it composes with data-parallel batch
sharding, (d) stage params are really sharded and activations move by
collective-permute (no param all-gather).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.models.layers import Transformer
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
from debiasing_multi_modal_tpu.parallel.pp import (
    pipeline_transformer,
    pipelined_text_encode,
    pipelined_vit_encode,
    stack_block_params,
    validate_pp,
)

L, D, H, S, B = 4, 64, 2, 10, 8


@pytest.fixture(scope="module")
def stack():
    tr = Transformer(width=D, layers=L, heads=H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    variables = tr.init(jax.random.PRNGKey(0), x)
    stacked, n = stack_block_params(variables["params"])
    assert n == L
    return tr, variables, x, stacked


@pytest.mark.parametrize("microbatches", [1, 2, 4, 8])
def test_pp_matches_sequential(stack, microbatches):
    tr, variables, x, stacked = stack
    ref = tr.apply(variables, x)
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_causal_matches_sequential(stack):
    tr, variables, x, stacked = stack
    ref = tr.apply(variables, x, causal=True)
    mesh = make_mesh((2,), ("stage",), devices=jax.devices()[:2])
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=4, causal=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_composes_with_dp(stack):
    tr, variables, x, stacked = stack
    ref = tr.apply(variables, x)
    mesh = make_mesh((2, 4), ("data", "stage"))
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=2, batch_axis="data"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_real_text_tower_subtree():
    """The stacked layout must round-trip a real CLIP tower's transformer
    subtree (the torch-checkpoint layout weights/convert.py fills)."""
    cfg = CLIPConfig(
        name="tiny-pp",
        embed_dim=32,
        image_resolution=32,
        vision_layers=1,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=D,
        transformer_heads=H,
        transformer_layers=L,
        vocab_size=128,
    )
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(1), batch=1)
    sub = variables["params"]["text"]["transformer"]
    stacked, n = stack_block_params(sub)
    assert n == L

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, cfg.context_length, D)), jnp.float32)
    tr = Transformer(width=D, layers=L, heads=H)
    ref = tr.apply({"params": sub}, x, causal=True)
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=2, causal=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_params_sharded_and_activations_permuted(stack):
    """Stage params must land split over the stage axis (L/4 layers per
    device) and the compiled program must move activations by
    collective-permute with NO all-gather of the stacked params."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    sharded = jax.device_put(
        stacked,
        jax.tree.map(lambda _: NamedSharding(mesh, P("stage")), stacked),
    )
    leaf = jax.tree.leaves(sharded)[0]
    assert len(leaf.addressable_shards) == 4
    assert leaf.addressable_shards[0].data.shape[0] == L // 4

    fn = jax.jit(
        lambda p, x: pipeline_transformer(
            p, x, mesh=mesh, num_heads=H, microbatches=2
        )
    )
    hlo = fn.lower(sharded, x).compile().as_text().lower()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo
    ref = tr.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(fn(sharded, x)), np.asarray(ref), atol=1e-5
    )


def test_pp_3d_matches_sequential(stack):
    """Full 3D parallelism on one mesh — dp x pp x tp (2x2x2): Megatron
    column/row sharding INSIDE each pipeline stage (manual psum per
    row-parallel projection) must reproduce the sequential stack."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"))
    for causal in (False, True):
        ref = tr.apply(variables, x, causal=causal)
        out = pipeline_transformer(
            stacked, x, mesh=mesh, num_heads=H, microbatches=2, causal=causal,
            batch_axis="data", model_axis="model",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_3d_gradients_match_sequential(stack):
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"))
    rng = np.random.default_rng(3)
    tgt = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

    def loss_pp(p):
        y = pipeline_transformer(
            p, x, mesh=mesh, num_heads=H, microbatches=2,
            batch_axis="data", model_axis="model",
        )
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq, _ = stack_block_params(
        jax.grad(
            lambda p: jnp.mean((tr.apply({"params": p}, x) - tgt) ** 2)
        )(variables["params"])
    )
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pp_3d_heads_validation(stack):
    tr, variables, x, stacked = stack
    mesh = make_mesh((1, 2, 4), ("data", "stage", "model"))
    with pytest.raises(ValueError, match="attention heads"):
        pipeline_transformer(
            stacked, x, mesh=mesh, num_heads=H, microbatches=2,
            model_axis="model",
        )


def test_pp_4d_matches_sequential(stack):
    """pp x tp x sp on one mesh: in-stage Megatron tp AND the sequence axis
    sharded with per-block ring attention must reproduce the sequential
    stack, causal and not."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("stage", "model", "seq"))
    for causal in (False, True):
        ref = tr.apply(variables, x, causal=causal)
        out = pipeline_transformer(
            stacked, x, mesh=mesh, num_heads=H, microbatches=2, causal=causal,
            model_axis="model", seq_axis="seq",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_sp_composes_without_tp(stack):
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("data", "stage", "seq"))
    ref = tr.apply(variables, x, causal=True)
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=2, causal=True,
        batch_axis="data", seq_axis="seq",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pp_sp_ulysses_flavor(stack):
    """seq_impl='ulysses' (all-to-all head<->seq exchange) must match the
    sequential stack just like the ring flavor."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("data", "stage", "seq"))
    for causal in (False, True):
        ref = tr.apply(variables, x, causal=causal)
        out = pipeline_transformer(
            stacked, x, mesh=mesh, num_heads=H, microbatches=2, causal=causal,
            batch_axis="data", seq_axis="seq", seq_impl="ulysses",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    with pytest.raises(ValueError, match="ulysses needs local heads"):
        # tp=2 leaves 1 local head — not divisible by the seq axis
        mesh4 = make_mesh((2, 2, 2), ("stage", "model", "seq"))
        pipeline_transformer(
            stacked, x, mesh=mesh4, num_heads=H, microbatches=2,
            model_axis="model", seq_axis="seq", seq_impl="ulysses",
        )


def test_pp_4d_gradients_match_sequential(stack):
    """Gradients flow through the scan schedule, the in-stage psums, AND
    ring attention's custom VJP in one program."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("stage", "model", "seq"))
    rng = np.random.default_rng(4)
    tgt = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

    def loss_pp(p):
        y = pipeline_transformer(
            p, x, mesh=mesh, num_heads=H, microbatches=2, causal=True,
            model_axis="model", seq_axis="seq",
        )
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq, _ = stack_block_params(
        jax.grad(
            lambda p: jnp.mean(
                (tr.apply({"params": p}, x, causal=True) - tgt) ** 2
            )
        )(variables["params"])
    )
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pp_remat_gradients_identical(stack):
    """remat=True (jax.checkpoint per layer — the memory-true backward for
    pod-scale training) must not change gradients at all."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("stage", "model", "seq"))
    rng = np.random.default_rng(5)
    tgt = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

    def loss(p, remat):
        y = pipeline_transformer(
            p, x, mesh=mesh, num_heads=H, microbatches=2, causal=True,
            model_axis="model", seq_axis="seq", remat=remat,
        )
        return jnp.mean((y - tgt) ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(stacked)
    g1 = jax.grad(lambda p: loss(p, True))(stacked)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pp_seq_validation(stack):
    tr, variables, x, stacked = stack
    mesh = make_mesh((2, 2, 2), ("data", "stage", "seq"))
    with pytest.raises(ValueError, match="sequence"):
        pipeline_transformer(
            stacked, x[:, :9], mesh=mesh, num_heads=H, microbatches=2,
            seq_axis="seq",
        )


def test_pp_gradients_match_sequential(stack):
    """The schedule is a scan, so jax.grad trains THROUGH pp-sharded layers:
    param- and input-gradients must equal the sequential stack's."""
    tr, variables, x, stacked = stack
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    tgt = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)

    def loss_pp(p, xx):
        y = pipeline_transformer(p, xx, mesh=mesh, num_heads=H, microbatches=2)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(params, xx):
        return jnp.mean((tr.apply({"params": params}, xx) - tgt) ** 2)

    g_pp, gx_pp = jax.grad(loss_pp, argnums=(0, 1))(stacked, x)
    g_seq_tree, gx_seq = jax.grad(loss_seq, argnums=(0, 1))(
        variables["params"], x
    )
    g_seq, _ = stack_block_params(g_seq_tree)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_pp), np.asarray(gx_seq), atol=1e-5)


def test_pp_full_tower_encodes_match_modules():
    """Both full-tower helpers (patchify/embed -> pipelined stack -> head)
    must reproduce the Flax modules' encode_image / encode_text on a
    dp x pp x tp mesh."""
    cfg = CLIPConfig(
        name="tiny-pp-towers",
        embed_dim=32,
        image_resolution=32,
        vision_layers=4,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=D,
        transformer_heads=H,
        transformer_layers=L,
        vocab_size=128,
    )
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    ids = np.zeros((8, cfg.context_length), np.int32)
    for i in range(8):
        n = int(rng.integers(3, 10))
        ids[i, :n] = rng.integers(1, 126, n)
        ids[i, n] = 127  # EOT = highest id (models/text.py argmax gather)
    ids = jnp.asarray(ids)

    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"))
    ref_i = model.apply(variables, imgs, method=model.encode_image)
    out_i = pipelined_vit_encode(
        model, variables, imgs, mesh=mesh, microbatches=2,
        batch_axis="data", model_axis="model",
    )
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i), atol=2e-5)

    ref_t = model.apply(variables, ids, method=model.encode_text)
    out_t = pipelined_text_encode(
        model, variables, ids, mesh=mesh, microbatches=2,
        batch_axis="data", model_axis="model",
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=2e-5)


def test_pp_full_tower_bf16_policy():
    """The pipelined encode must track the module under the bf16 compute
    policy too (params fp32, activations bf16, LN stats fp32 — the manual
    block's dtype casts mirror models/layers.py)."""
    cfg = CLIPConfig(
        name="tiny-pp-bf16",
        embed_dim=32,
        image_resolution=32,
        vision_layers=4,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=D,
        transformer_heads=H,
        transformer_layers=L,
        vocab_size=128,
    ).with_dtype(jnp.bfloat16)
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    rng = np.random.default_rng(8)
    imgs = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"))
    ref = model.apply(variables, imgs, method=model.encode_image)
    out = pipelined_vit_encode(
        model, variables, imgs, mesh=mesh, microbatches=2,
        batch_axis="data", model_axis="model",
    )
    assert out.dtype == ref.dtype
    # bf16 ulp-level divergence only (psum ordering, LN rounding): bound
    # absolute error at a few bf16 ulps of the ~unit-scale outputs and pin
    # near-perfect alignment
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=0)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, cos


def test_pp_program_cache_reuses_compiled_fn(stack):
    """Repeated calls with the same mesh/shapes/options must reuse ONE jit
    object (per-batch encode loops would otherwise re-trace and re-pay the
    tunnel compile every call), while different param VALUES still produce
    correct outputs through the cached program."""
    from debiasing_multi_modal_tpu.parallel import pp as ppmod

    tr, variables, x, stacked = stack
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    ppmod._PROGRAM_CACHE.clear()
    out1 = pipeline_transformer(stacked, x, mesh=mesh, num_heads=H,
                                microbatches=2)
    assert len(ppmod._PROGRAM_CACHE) == 1
    scaled = jax.tree.map(lambda l: l * 0.5, stacked)
    out2 = pipeline_transformer(scaled, x, mesh=mesh, num_heads=H,
                                microbatches=2)
    assert len(ppmod._PROGRAM_CACHE) == 1  # same program, new values
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # different microbatching is a different schedule -> new entry
    pipeline_transformer(stacked, x, mesh=mesh, num_heads=H, microbatches=4)
    assert len(ppmod._PROGRAM_CACHE) == 2


def test_pp_tower_helpers_prestacked_and_kwarg_clash():
    """A pre-stacked tree (steady-state loops) must match the re-stacking
    path, and overlapping fixed kwargs are rejected with a clear message
    instead of a 'multiple values' TypeError."""
    cfg = CLIPConfig(
        name="tiny-pp-pre",
        embed_dim=32,
        image_resolution=32,
        vision_layers=4,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=D,
        transformer_heads=H,
        transformer_layers=L,
        vocab_size=128,
    )
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    pre, _ = stack_block_params(variables["params"]["visual"]["transformer"])
    out_pre = pipelined_vit_encode(
        model, variables, imgs, mesh=mesh, microbatches=2, stacked=pre
    )
    out = pipelined_vit_encode(model, variables, imgs, mesh=mesh, microbatches=2)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out))
    with pytest.raises(TypeError, match="fixed by the tower encode"):
        pipelined_text_encode(
            model, variables, jnp.zeros((4, 77), jnp.int32), mesh=mesh,
            causal=True,
        )


def test_pp_tower_helpers_reject_quant_and_fuse_qkv():
    """quant/fuse_qkv towers have IDENTICAL param trees, so without the
    guard the pipelined encode would silently run default-precision math."""
    cfg = CLIPConfig(
        name="tiny-pp-guard",
        embed_dim=32,
        image_resolution=32,
        vision_layers=4,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=D,
        transformer_heads=H,
        transformer_layers=L,
        vocab_size=128,
    )
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    base = create_clip(cfg)
    variables = init_clip(base, jax.random.PRNGKey(0), batch=1)
    imgs = jnp.zeros((4, 32, 32, 3), jnp.float32)
    fused = create_clip(cfg, fuse_qkv=True)
    with pytest.raises(ValueError, match="fuse_qkv"):
        pipelined_vit_encode(fused, variables, imgs, mesh=mesh)
    quant = create_clip(cfg, quant="int8")
    with pytest.raises(ValueError, match="quant"):
        pipelined_vit_encode(quant, variables, imgs, mesh=mesh)


def test_pp_single_stage_degenerates_to_plain_scan(stack):
    tr, variables, x, stacked = stack
    mesh = make_mesh((4, 1), ("data", "stage"), devices=jax.devices()[:4])
    out = pipeline_transformer(
        stacked, x, mesh=mesh, num_heads=H, microbatches=2, batch_axis="data"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(tr.apply(variables, x)), atol=1e-5
    )


def test_pp_validation():
    with pytest.raises(ValueError, match="must divide"):
        validate_pp(4, 3, 8, 2)
    with pytest.raises(ValueError, match="must divide"):
        validate_pp(4, 2, 8, 3)
    with pytest.raises(ValueError, match="no 'resblocks_"):
        stack_block_params({"ln": {}})
    with pytest.raises(ValueError, match="non-contiguous"):
        stack_block_params({"resblocks_0": {"a": jnp.zeros(1)},
                            "resblocks_2": {"a": jnp.zeros(1)}})
