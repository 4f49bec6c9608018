"""Second coverage-gap batch (scripts/stdlib_coverage.py findings): error and
fallback paths a migrating user can actually hit — vocab discovery, template
registry, metadata CSV validation, embedding-store format guards, the packed
float-only contract, the DMT_PLATFORM override, l2_normalize's eps guard, and
the quant-impl guards.
"""

import json
import os

import numpy as np
import pytest

import debiasing_multi_modal_tpu.tokenizer.bpe as bpe_mod
from debiasing_multi_modal_tpu.data.embeddings_store import (
    EmbeddingTable,
    load_embeddings,
    save_embeddings,
    save_text_embeddings,
)
from debiasing_multi_modal_tpu.data.groups import (
    GroupTable,
    load_metadata,
    load_waterbirds_metadata,
)
from debiasing_multi_modal_tpu.templates import get_prompts


# ------------------------------------------------------------- tokenizer ----


def test_bpe_vocab_explicit_path_contract(tmp_path):
    with pytest.raises(FileNotFoundError, match="not found"):
        bpe_mod._find_bpe_vocab(str(tmp_path / "nope.txt.gz"))
    real = bpe_mod._find_bpe_vocab(None)
    assert bpe_mod._find_bpe_vocab(real) == real


def test_bpe_vocab_env_var_and_search_miss(tmp_path, monkeypatch):
    real = bpe_mod._find_bpe_vocab(None)
    monkeypatch.setenv(bpe_mod._VOCAB_ENV_VAR, real)
    monkeypatch.setattr(bpe_mod, "_VOCAB_SEARCH_PATHS", ())
    assert bpe_mod._find_bpe_vocab(None) == real
    monkeypatch.delenv(bpe_mod._VOCAB_ENV_VAR)
    with pytest.raises(FileNotFoundError, match="BPE merges file"):
        bpe_mod._find_bpe_vocab(None)


def test_bpe_without_ftfy_matches_on_clean_text(monkeypatch):
    """The NFC fallback (no ftfy) must tokenize already-clean prompts
    identically — the reference corpus is plain ascii templates."""
    tok = bpe_mod.ClipTokenizer()
    prompts = ["a photo of a landbird.", "This is a water-background photo."]
    with_ftfy = [tok.encode(p) for p in prompts]
    monkeypatch.setattr(bpe_mod, "_HAS_FTFY", False)
    without = [tok.encode(p) for p in prompts]
    assert with_ftfy == without


# -------------------------------------------------------------- templates ----


def test_template_registry_properties_and_unknown():
    wb = get_prompts("waterbirds")
    assert wb.n_classes == 2 and wb.n_groups == 4
    with pytest.raises(ValueError, match="unknown dataset"):
        get_prompts("imagenet")


# ------------------------------------------------------------------ groups ----


def _table(n=6):
    y = np.arange(n, dtype=np.int32) % 2
    place = (np.arange(n, dtype=np.int32) // 2) % 2
    return GroupTable(
        filenames=np.asarray([f"{i}.jpg" for i in range(n)]),
        y=y,
        place=place,
        split=np.zeros(n, np.int32),
        n_classes=2,
        n_places=2,
    )


def test_group_labels_selector_matches_train_target_semantics():
    t = _table()
    assert (t.labels("class") == t.y).all()
    assert (t.labels("spurious") == t.place).all()
    assert (t.labels("group") == t.y * 2 + t.place).all()
    with pytest.raises(KeyError):
        t.labels("bogus")


def test_metadata_csv_validation(tmp_path):
    (tmp_path / "metadata.csv").write_text("")  # empty: no header row
    with pytest.raises(ValueError, match="empty CSV"):
        load_waterbirds_metadata(str(tmp_path))
    (tmp_path / "metadata.csv").write_text("img_id,img_filename,y\n0,a.jpg,1\n")
    with pytest.raises(ValueError, match="missing columns"):
        load_waterbirds_metadata(str(tmp_path))
    with pytest.raises(ValueError, match="unknown dataset"):
        load_metadata("cifar", str(tmp_path))


# ---------------------------------------------------------------- store ----


def _tiny_table(n=4, d=6):
    rng = np.random.default_rng(1)
    return EmbeddingTable(
        filenames=np.asarray([f"f{i}.jpg" for i in range(n)]),
        y=rng.integers(0, 2, n).astype(np.int32),
        place=rng.integers(0, 2, n).astype(np.int32),
        group=rng.integers(0, 4, n).astype(np.int32),
        split=np.zeros(n, np.int32),
        y_pred=rng.integers(0, 2, n).astype(np.int32),
        embeddings=rng.standard_normal((n, d)).astype(np.float32),
    )


def test_store_format_guards(tmp_path):
    table = _tiny_table()
    with pytest.raises(ValueError, match="requires a .npz path"):
        save_embeddings(str(tmp_path / "clip"), table, fmt="npz")
    with pytest.raises(ValueError, match="unknown format"):
        save_embeddings(str(tmp_path / "clip.bin"), table, fmt="bin")


def test_align_to_missing_file_raises():
    table = _tiny_table()
    meta = GroupTable(
        filenames=np.asarray(["f0.jpg", "ghost.jpg"]),
        y=np.zeros(2, np.int32),
        place=np.zeros(2, np.int32),
        split=np.zeros(2, np.int32),
        n_classes=2,
        n_places=2,
    )
    with pytest.raises(ValueError, match="missing file 'ghost.jpg'"):
        table.align_to(meta)


def test_corrupt_json_reports_both_parser_diagnostics(tmp_path):
    path = tmp_path / "clip.json"
    path.write_text('{"broken": ')
    with pytest.raises(Exception) as ei:
        load_embeddings(str(path), dataset="waterbirds")
    # whichever parser ran last, the message must locate the file/problem
    assert "clip.json" in str(ei.value) or "Expecting" in str(ei.value)


def test_save_text_embeddings_length_mismatch(tmp_path):
    with pytest.raises(ValueError, match="prompts vs"):
        save_text_embeddings(
            str(tmp_path / "t.json"), ["a", "b"], np.zeros((3, 4), np.float32)
        )


# ---------------------------------------------------------------- parallel ----


def test_pack_tree_rejects_int_leaves():
    from debiasing_multi_modal_tpu.parallel.packing import pack_tree

    with pytest.raises(TypeError, match="float leaves only"):
        pack_tree({"w": np.ones((2, 2), np.float32), "i": np.ones(3, np.int32)})


def test_apply_platform_env(monkeypatch):
    import jax

    from debiasing_multi_modal_tpu.utils.platform import apply_platform_env

    # the test session is already pinned to cpu (conftest); re-applying the
    # same platform through the override must be a no-op success
    monkeypatch.setenv("DMT_PLATFORM", "cpu")
    apply_platform_env()
    assert jax.config.jax_platforms == "cpu"
    monkeypatch.delenv("DMT_PLATFORM")
    apply_platform_env()  # absent: leaves config untouched
    assert jax.config.jax_platforms == "cpu"


# ---------------------------------------------------------------- numerics ----


def test_l2_normalize_eps_guards_zero_rows():
    import jax.numpy as jnp

    from debiasing_multi_modal_tpu.models.clip import l2_normalize

    x = jnp.zeros((2, 4), jnp.float32)
    out = l2_normalize(x, eps=1e-6)
    assert bool(jnp.isfinite(out).all()) and float(jnp.abs(out).max()) == 0.0


def test_int8_dense_guards_and_no_bias():
    import jax.numpy as jnp

    from debiasing_multi_modal_tpu.ops.quant import Int8Dense, int8_dense

    x = np.ones((2, 8), np.float32)
    k = np.ones((8, 4), np.float32)
    with pytest.raises(ValueError, match="unknown int8_dense impl"):
        int8_dense(jnp.asarray(x), jnp.asarray(k), impl="cuda")
    mod = Int8Dense(features=4, use_bias=False)
    vars_ = mod.init(__import__("jax").random.PRNGKey(0), jnp.asarray(x))
    assert "bias" not in vars_["params"]
    out = mod.apply(vars_, jnp.asarray(x))
    assert out.shape == (2, 4)
