"""Third coverage-gap batch: extraction-runner paths the main suite missed —
multi-template mean pooling (clip_inference.py:63-65 semantics), the
``preprocessed`` feed, the empty-stream result, shard-resume misalignment
and empty-manifest guards — plus the CP/GP run-name suffix of non-alter reg
methods (final_main.py:1070-1096).
"""

import numpy as np
import pytest

import jax

from debiasing_multi_modal_tpu.extract.runner import (
    ExtractionRunner,
    encode_text_prompts,
    merged_table,
)
from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import encode_run_name

TINY_VIT = CLIPConfig(
    name="tiny-vit",
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = create_clip(TINY_VIT)
    variables = init_clip(model, jax.random.PRNGKey(0), batch=1)
    return model, variables


def _batch(rng, n, b=0):
    images = (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8)
    y = rng.integers(0, 2, n).astype(np.int32)
    place = rng.integers(0, 2, n).astype(np.int32)
    return images, {
        "filenames": np.asarray([f"b{b}_{i}.jpg" for i in range(n)]),
        "y": y,
        "place": place,
        "group": y * 2 + place,
        "split": np.zeros(n, np.int32),
    }


def test_multi_template_mean_pooling(model_and_vars):
    model, variables = model_and_vars
    # two phrases x two templates, interleaved per phrase like the
    # reference's template loop (clip_inference.py:63-65)
    prompts = [
        "a photo of a landbird.",
        "a picture of a landbird.",
        "a photo of a waterbird.",
        "a picture of a waterbird.",
    ]
    pooled = encode_text_prompts(
        model, variables, {"class": prompts}, templates_per_phrase=2
    )["class"]
    per_prompt = encode_text_prompts(model, variables, {"class": prompts})["class"]
    assert pooled.shape == (2, 32)
    np.testing.assert_allclose(
        pooled, per_prompt.reshape(2, 2, -1).mean(axis=1), rtol=1e-6
    )


def test_preprocessed_feed_matches_identity_preprocess(model_and_vars):
    """Images already at target resolution: the ``preprocessed`` fast path
    (scale + normalize only) must produce the embeddings of the full device
    preprocess, whose resize/crop degenerate to identity at that size."""
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    text = rng.standard_normal((2, 32)).astype(np.float32)
    images, meta = _batch(rng, 8)
    mesh = make_mesh((8,))
    full = ExtractionRunner(model, variables, text, mesh=mesh)
    fast = ExtractionRunner(model, variables, text, mesh=mesh, preprocessed=True)
    t_full = full.run(iter([(images, meta)]), prefetch_depth=0)
    t_fast = fast.run(iter([(images, meta)]), prefetch_depth=0)
    np.testing.assert_allclose(
        t_fast.embeddings, t_full.embeddings, rtol=2e-2, atol=2e-3
    )
    np.testing.assert_array_equal(t_fast.y_pred, t_full.y_pred)


def test_empty_stream_returns_empty_table(model_and_vars):
    model, variables = model_and_vars
    text = np.zeros((2, 32), np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))
    table = runner.run(iter([]), prefetch_depth=0)
    assert len(table) == 0 and table.embeddings.shape == (0, 32)


def test_merged_table_requires_shards(tmp_path):
    with pytest.raises(ValueError, match="no shards recorded"):
        merged_table(str(tmp_path))


def test_resume_misalignment_fails_loudly(tmp_path, model_and_vars):
    """A resumed sharded run whose stream uses a different batch size must
    error instead of silently dropping or duplicating rows."""
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))
    shard_dir = str(tmp_path / "shards")

    first = [_batch(rng, 8, b=i) for i in range(2)]  # 16 rows, bs 8
    runner.run(iter(first), prefetch_depth=0, shard_dir=shard_dir, shard_every=1)

    resumed = [_batch(rng, 12, b=i) for i in range(2)]  # boundary lands at 24
    with pytest.raises(ValueError, match="resume misalignment"):
        runner.run(
            iter(resumed), prefetch_depth=0, shard_dir=shard_dir, shard_every=1
        )


def test_run_name_cp_gp_suffix_for_non_alter_methods():
    base = dict(
        tl_method="adapter_reg_seq",
        epochs=10,
        epochs_feature_learning=5,
        batch_size=32,
        batch_size_reg=16,
    )
    gp = encode_run_name(TrainConfig(**base))
    cp = encode_run_name(TrainConfig(use_cls_prompt_in_reg=True, **base))
    assert gp.endswith("_GP") or "_GP_" in gp
    assert cp.endswith("_CP") or "_CP_" in cp
    alter = encode_run_name(
        TrainConfig(**{**base, "tl_method": "adapter_reg_seq_alter"})
    )
    assert "_GP" not in alter and "_CP" not in alter
