"""Extraction runner tests on the 8-device CPU mesh: zero-shot prediction
correctness, sharding invariance, and the Stage A -> Stage B round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debiasing_multi_modal_tpu.extract.runner import (
    ExtractionRunner,
    ZS_TEMPERATURE,
    encode_text_prompts,
    minority_report,
)
from debiasing_multi_modal_tpu.models import create_clip, init_clip
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.parallel.mesh import make_mesh
from debiasing_multi_modal_tpu.templates import WATERBIRDS

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


def test_encode_text_prompts(model_and_vars):
    model, variables = model_and_vars
    out = encode_text_prompts(
        model,
        variables,
        {
            "class": WATERBIRDS.prompts("class"),
            "spurious": WATERBIRDS.prompts("spurious"),
            "group": WATERBIRDS.prompts("group"),
        },
    )
    assert out["class"].shape == (2, 32)
    assert out["group"].shape == (4, 32)
    # un-normalized storage (clip_inference.py:64-66)
    norms = np.linalg.norm(out["class"], axis=-1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_extraction_zero_shot_predictions(model_and_vars, rng):
    model, variables = model_and_vars
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((1,)))
    images = (rng.random((6, 32, 32, 3)) * 255).astype(np.uint8)
    emb, preds = runner.encode_batch(images)
    assert emb.shape == (6, 32) and preds.shape == (6,)

    # predictions must equal the manual normalized-cosine argmax
    normed = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    w = text.T / np.linalg.norm(text.T, axis=0, keepdims=True)
    expect = (normed @ w / ZS_TEMPERATURE).argmax(-1)
    np.testing.assert_array_equal(preds, expect)


def test_extraction_sharding_invariance(model_and_vars, rng):
    """Embeddings must be identical on a 1-device and an 8-device mesh
    (SURVEY.md §7 distributed test)."""
    model, variables = model_and_vars
    text = rng.standard_normal((2, 32)).astype(np.float32)
    images = (rng.random((16, 32, 32, 3)) * 255).astype(np.uint8)

    single = ExtractionRunner(
        model, variables, text, mesh=make_mesh((1,), devices=jax.devices()[:1])
    )
    multi = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))
    e1, p1 = single.encode_batch(images)
    e8, p8 = multi.encode_batch(images)
    np.testing.assert_allclose(e1, e8, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(p1, p8)


def test_extraction_pads_ragged_batches(model_and_vars, rng):
    model, variables = model_and_vars
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))
    images = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)  # 5 % 8 != 0
    emb, preds = runner.encode_batch(images)
    assert emb.shape == (5, 32)


def test_run_builds_table_and_roundtrips(tmp_path, model_and_vars, rng):
    from debiasing_multi_modal_tpu.data.embeddings_store import (
        load_embeddings,
        save_embeddings,
    )

    model, variables = model_and_vars
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))

    def batches():
        for b in range(2):
            n = 8
            images = (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8)
            y = rng.integers(0, 2, n).astype(np.int32)
            place = rng.integers(0, 2, n).astype(np.int32)
            yield images, {
                "filenames": np.asarray([f"b{b}_{i}.jpg" for i in range(n)]),
                "y": y,
                "place": place,
                "group": y * 2 + place,
                "split": np.zeros(n, np.int32),
            }

    table = runner.run(batches())
    assert len(table) == 16 and table.embeddings.shape == (16, 32)

    path = str(tmp_path / "clip.json")
    save_embeddings(path, table, fmt="json", dataset="waterbirds")
    loaded = load_embeddings(path, dataset="waterbirds")
    np.testing.assert_allclose(loaded.embeddings, table.embeddings, atol=1e-6)
    np.testing.assert_array_equal(loaded.y_pred, table.y_pred)

    report = minority_report(table.y, table.place, table.y_pred, "waterbirds")
    assert "recall" in report or "1" in report


def test_sharded_extraction_resumes_after_crash(tmp_path, model_and_vars, rng):
    """Crash-safe sharding (SURVEY §5.3 — the reference loses a whole run):
    a killed run leaves complete shards + manifest; a re-run skips the
    persisted batches and the merged table equals a clean full run."""
    from debiasing_multi_modal_tpu.extract.runner import (
        completed_batches, merged_table,
    )

    model, variables = model_and_vars
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))

    n_batches, bs = 7, 8
    imgs = [
        (rng.random((bs, 32, 32, 3)) * 255).astype(np.uint8)
        for _ in range(n_batches)
    ]
    metas = [
        {
            "filenames": np.array([f"b{i}_{j}.jpg" for j in range(bs)]),
            "y": np.full(bs, i % 2, np.int32),
            "place": np.full(bs, i % 2, np.int32),
            "group": np.full(bs, i % 4, np.int32),
            "split": np.zeros(bs, np.int32),
        }
        for i in range(n_batches)
    ]
    stream = lambda k: iter(list(zip(imgs[:k], metas[:k])))  # noqa: E731

    full = runner.run(stream(n_batches), prefetch_depth=0)

    def crashing_stream():
        for i in range(5):
            yield imgs[i], metas[i]
        raise RuntimeError("killed")

    shard_dir = str(tmp_path / "shards")
    # crash mid-run after 5 batches: only the two complete shards (4 batches)
    # persist; the 5th was in memory and is lost (reprocessed on resume)
    with pytest.raises(RuntimeError, match="killed"):
        runner.run(crashing_stream(), prefetch_depth=0,
                   shard_dir=shard_dir, shard_every=2)
    assert completed_batches(shard_dir) == 4
    # resume over the FULL stream: skips 4 batches' rows, processes 3 more,
    # and returns the merged table across both runs
    merged = runner.run(
        stream(n_batches), prefetch_depth=0, shard_dir=shard_dir, shard_every=2
    )
    assert completed_batches(shard_dir) == n_batches
    assert len(merged) == n_batches * bs
    assert list(merged.filenames) == list(full.filenames)
    np.testing.assert_array_equal(merged.y, full.y)
    np.testing.assert_array_equal(merged.group, full.group)
    np.testing.assert_array_equal(merged.y_pred, full.y_pred)
    np.testing.assert_allclose(merged.embeddings, full.embeddings, rtol=1e-6)
    assert list(merged_table(shard_dir).filenames) == list(full.filenames)

    # a resume whose batch boundaries don't align with the persisted rows
    # must fail loudly (silent image loss otherwise)
    mis = [
        (np.concatenate([imgs[0], imgs[1][:4]]),
         {k: np.concatenate([metas[0][k], metas[1][k][:4]]) for k in metas[0]})
    ]
    with pytest.raises(ValueError, match="misalignment"):
        runner.run(iter(mis), prefetch_depth=0,
                   shard_dir=shard_dir, shard_every=2)

    # resuming under different extraction settings must fail loudly
    runner.run(stream(2), prefetch_depth=0,
               shard_dir=str(tmp_path / "s2"), shard_every=1,
               shard_meta={"backbone": "tiny", "normalized": False})
    with pytest.raises(ValueError, match="different extraction settings"):
        runner.run(stream(2), prefetch_depth=0,
                   shard_dir=str(tmp_path / "s2"), shard_every=1,
                   shard_meta={"backbone": "tiny", "normalized": True})

    # ...but JSON-lossy metas that are EQUAL must not spuriously mismatch
    # (the manifest copy went through json.dump: tuples -> lists)
    runner.run(stream(2), prefetch_depth=0,
               shard_dir=str(tmp_path / "s3"), shard_every=1,
               shard_meta={"resolution": (32, 32)})
    runner.run(stream(2), prefetch_depth=0,
               shard_dir=str(tmp_path / "s3"), shard_every=1,
               shard_meta={"resolution": (32, 32)})

    # an EMPTY resume stream is the same stale-shard defect, not an
    # exemption: returning the full persisted table would be silent staleness
    with pytest.raises(ValueError, match="misalignment"):
        runner.run(iter([]), prefetch_depth=0,
                   shard_dir=shard_dir, shard_every=2)
