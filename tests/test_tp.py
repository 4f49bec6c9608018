"""Encoder tensor parallelism (parallel/tp.py) on the virtual 8-device mesh.

The reference has no distribution at all (SURVEY.md §2.9); these tests pin the
TPU-native pod-scale story: Megatron-style model-axis sharding of the ViT /
text transformer blocks (reference surface clip/model.py:171-240) and the
ModifiedResNet attention pool (:58-91) must (a) really shard the parameters,
(b) reproduce the replicated forward exactly (same math, collectives inserted
by XLA), and (c) compose with data-parallel batch sharding in the extraction
runner.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.parallel.mesh import batch_sharding, make_mesh
from debiasing_multi_modal_tpu.parallel import tp as tpmod


def _vit_cfg():
    # vision_width 128 -> 2 heads; transformer_heads 4: both divisible by tp=2
    return CLIPConfig(
        name="tiny-vit",
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=128,
        vision_patch_size=16,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
        vocab_size=128,
    )


def _rn_cfg():
    # width 8 -> attnpool embed 256, heads 4 (width*32/64); tp=2 divides
    return CLIPConfig(
        name="tiny-rn",
        embed_dim=32,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=8,
        vision_patch_size=None,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
        vocab_size=128,
    )


def _token_batch(n, vocab=128):
    rng = np.random.default_rng(0)
    toks = np.zeros((n, 77), np.int64)
    for i in range(n):
        length = int(rng.integers(3, 10))
        toks[i, 0] = vocab - 2
        toks[i, 1 : length - 1] = rng.integers(1, vocab - 2, length - 2)
        toks[i, length - 1] = vocab - 1
    return toks


def test_tp_specs_cover_all_transformer_blocks():
    cfg = _vit_cfg()
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    specs = tpmod.tp_specs(variables)
    # every resblock contributes 6 sharded kernels + 4 sharded biases
    # (q/k/v col + bias, c_fc col + bias, out_proj row, mlp c_proj row)
    per_block = 10
    n_blocks = cfg.vision_layers + cfg.transformer_layers
    assert tpmod.sharded_param_count(variables) == per_block * n_blocks
    vit_attn = specs["params"]["visual"]["transformer"]["resblocks_0"]["attn"]
    assert vit_attn["q_proj"]["kernel"] == P(None, "model")
    assert vit_attn["q_proj"]["bias"] == P("model")
    assert vit_attn["out_proj"]["kernel"] == P("model", None)
    assert vit_attn["out_proj"]["bias"] == P()
    mlp = specs["params"]["visual"]["transformer"]["resblocks_0"]["mlp"]
    assert mlp["c_fc"]["kernel"] == P(None, "model")
    assert mlp["c_proj"]["kernel"] == P("model", None)
    # residual-stream params stay replicated
    assert specs["params"]["visual"]["proj"] == P()
    assert specs["params"]["visual"]["patch_kernel"] == P()
    assert specs["params"]["text"]["token_embedding"]["embedding"] == P()


def test_tp_specs_shard_rn_attnpool_not_convs():
    cfg = _rn_cfg()
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    specs = tpmod.tp_specs(variables)
    ap = specs["params"]["visual"]["attnpool"]
    assert ap["q_proj"]["kernel"] == P(None, "model")
    assert ap["c_proj"]["kernel"] == P("model", None)
    assert ap["c_proj"]["bias"] == P()
    # bottleneck convs and BN stats replicated
    assert specs["params"]["visual"]["layer1_0"]["conv1"]["kernel"] == P()
    assert specs["batch_stats"]["visual"]["bn1"]["mean"] == P()


def test_validate_tp_rejects_indivisible_heads():
    tpmod.validate_tp(_vit_cfg(), 2)  # ok
    with pytest.raises(ValueError, match="attention heads"):
        tpmod.validate_tp(_vit_cfg(), 8)  # vision has 2 heads


@pytest.mark.parametrize("cfg_fn", [_vit_cfg, _rn_cfg], ids=["vit", "resnet"])
def test_tp_forward_matches_replicated(cfg_fn):
    cfg = cfg_fn()
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    mesh = make_mesh((4, 2), ("data", "model"))
    tpmod.validate_tp(cfg, mesh.shape["model"])
    sv = tpmod.shard_variables(variables, mesh)

    # parameters are genuinely sharded: local shard is half the global row/col
    if cfg.is_vit:
        k = sv["params"]["visual"]["transformer"]["resblocks_0"]["attn"]["q_proj"]["kernel"]
    else:
        k = sv["params"]["visual"]["attnpool"]["q_proj"]["kernel"]
    assert k.addressable_shards[0].data.shape[1] * 2 == k.shape[1]

    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((8, cfg.image_resolution, cfg.image_resolution, 3)).astype(
        np.float32
    )
    toks = _token_batch(8)
    ref_i = model.apply(variables, jnp.asarray(imgs), method=model.encode_image)
    ref_t = model.apply(variables, jnp.asarray(toks, jnp.int32), method=model.encode_text)

    data_sh = batch_sharding(mesh)
    var_sh = tpmod.tp_shardings(variables, mesh)
    f_img = jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_image),
        in_shardings=(var_sh, data_sh),
    )
    f_txt = jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_text),
        in_shardings=(var_sh, data_sh),
    )
    out_i = f_img(sv, jax.device_put(jnp.asarray(imgs), data_sh))
    out_t = f_txt(sv, jax.device_put(jnp.asarray(toks, jnp.int32), data_sh))
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), rtol=2e-5, atol=2e-5)


def test_extraction_runner_tensor_parallel_matches_dp(rng):
    cfg = _vit_cfg()
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    text = rng.standard_normal((2, cfg.embed_dim)).astype(np.float32)
    images = (rng.random((16, 32, 32, 3)) * 255).astype(np.uint8)

    from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner

    dp_runner = ExtractionRunner(model, variables, text, mesh=make_mesh())
    tp_runner = ExtractionRunner(
        model,
        variables,
        text,
        mesh=make_mesh((4, 2), ("data", "model")),
        tensor_parallel=True,
    )
    e_dp, p_dp = dp_runner.encode_batch(images)
    e_tp, p_tp = tp_runner.encode_batch(images)
    np.testing.assert_allclose(e_tp, e_dp, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(p_tp, p_dp)


def test_extraction_runner_tp_requires_model_axis(rng):
    cfg = _vit_cfg()
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner

    with pytest.raises(ValueError, match="model"):
        ExtractionRunner(
            model,
            variables,
            rng.standard_normal((2, cfg.embed_dim)).astype(np.float32),
            mesh=make_mesh(),
            tensor_parallel=True,
        )


def test_tp_forward_matches_replicated_quant_int8():
    """tp x int8: per-channel weight scales under Megatron sharding.

    Column-parallel kernels (q/k/v, c_fc) shard the scale axis — scales stay
    local; row-parallel kernels (out_proj, c_proj) shard the K axis the
    per-channel amax reduces over, so XLA inserts an all-reduce max for the
    scales.  A single sharded ``int8_dense`` matches the replicated op to f32
    epsilon (measured 5e-6), but the FULL tower is not bit-identical across
    shardings: reduction-order ulp differences flip ``round()`` for values
    sitting on quantization boundaries, each flip worth one int8 step — so
    the pinned bound is a small multiple of the step (plus cosine), not
    bitwise equality.
    """
    cfg = _vit_cfg()
    model = create_clip(cfg, quant="int8")
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    mesh = make_mesh((4, 2), ("data", "model"))
    sv = tpmod.shard_variables(variables, mesh)

    rng = np.random.default_rng(2)
    imgs = rng.standard_normal(
        (8, cfg.image_resolution, cfg.image_resolution, 3)
    ).astype(np.float32)
    ref = model.apply(variables, jnp.asarray(imgs), method=model.encode_image)

    data_sh = batch_sharding(mesh)
    var_sh = tpmod.tp_shardings(variables, mesh)
    f_img = jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_image),
        in_shardings=(var_sh, data_sh),
    )
    out = f_img(sv, jax.device_put(jnp.asarray(imgs), data_sh))
    a, b = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    np.testing.assert_allclose(b, a, atol=0.02, rtol=0)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.999, cos
