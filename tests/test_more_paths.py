"""Additional path coverage: sweep CLI end-to-end, two-phase edge cases,
spurious-target training, device-side geometry extraction, profiling hooks."""

import json
import os

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.embeddings_store import (
    save_embeddings,
    save_text_embeddings,
)
from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
from debiasing_multi_modal_tpu.templates import WATERBIRDS
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table, train_all_epochs

BASE = dict(
    dataset="waterbirds",
    input_dim=32,
    adapter_feat_dim=8,
    batch_size=64,
    batch_size_reg=16,
    learning_rate=0.5,
    learning_rate_reg=0.5,
    lr_decay_epochs=(100,),
)


@pytest.fixture(scope="module")
def bundle():
    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=128, n_val=64, n_test=64, dim=32)
    )
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    return bundle_from_embedding_table(table, mbs, tc, ts, tg)


def test_feature_learning_spans_all_epochs(bundle):
    """epochs_feature_learning >= epochs: phase 2 never starts, MA never
    built (legal in the reference's flag space)."""
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=3, epochs_feature_learning=5,
        add_adapter=True, **BASE,
    )
    (_, _, te), _, hist = train_all_epochs(cfg, bundle, verbose=False)
    assert len(hist["val"]) == 3
    assert 0 <= te["worst_acc"] <= 1


def test_seq_with_cls_prompt_in_reg(bundle):
    cfg = TrainConfig(
        tl_method="adapter_reg_seq", epochs=5, epochs_feature_learning=2,
        use_cls_prompt_in_reg=True, **BASE,
    )
    (_, _, te), _, _ = train_all_epochs(cfg, bundle, verbose=False)
    assert te["mean_acc"] > 0.4


def test_spurious_train_target(bundle):
    """Training against the spurious attribute (reference --train_target
    spurious) — the spurious direction is the strong cue, so this converges
    fast."""
    cfg = TrainConfig(tl_method="adapter", epochs=4, train_target="spurious", **BASE)
    # NOTE: text_class in the bundle is the class matrix; the reference uses
    # whatever text json was passed — here class text still yields logits,
    # labels just switch to the spurious attribute.
    (_, va, _), _, _ = train_all_epochs(cfg, bundle, verbose=False)
    assert 0 <= va["mean_acc"] <= 1


def test_extraction_device_geometry(rng):
    """host_resolution=None ships raw fixed-size images and does resize+crop
    on device (the CelebA aligned-JPEG path)."""
    import jax

    from debiasing_multi_modal_tpu.extract.runner import ExtractionRunner
    from debiasing_multi_modal_tpu.models import create_clip, init_clip
    from debiasing_multi_modal_tpu.models.config import CLIPConfig
    from debiasing_multi_modal_tpu.parallel.mesh import make_mesh

    cfg = CLIPConfig(
        name="t", embed_dim=32, image_resolution=32, vision_layers=1,
        vision_width=64, vision_patch_size=16, transformer_width=64,
        transformer_heads=1, transformer_layers=1,
    )
    model = create_clip(cfg)
    variables = init_clip(model, jax.random.PRNGKey(0))
    text = rng.standard_normal((2, 32)).astype(np.float32)
    runner = ExtractionRunner(model, variables, text, mesh=make_mesh((8,)))
    # raw 48x40 images -> device resize to 32
    images = (rng.random((8, 48, 40, 3)) * 255).astype(np.uint8)
    emb, preds = runner.encode_batch(images)
    assert emb.shape == (8, 32)


def test_sweep_cli_end_to_end(tmp_path, capsys):
    from debiasing_multi_modal_tpu.cli import sweep_main
    from debiasing_multi_modal_tpu.cli.train_main import build_parser

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=64, n_val=32, n_test=32, dim=32)
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rows = ["img_id,img_filename,y,split,place"]
    for i in range(len(meta)):
        rows.append(f"{i},{meta.filenames[i]},{meta.y[i]},{meta.split[i]},{meta.place[i]}")
    (data_dir / "metadata.csv").write_text("\n".join(rows) + "\n")
    save_embeddings(str(tmp_path / "clip.npz"), table)
    for kind, mat in (("class", tc), ("spurious", ts), ("group", tg)):
        save_text_embeddings(
            str(tmp_path / f"clip_{kind}.json"), WATERBIRDS.prompts(kind), mat.T
        )

    args = sweep_main.extend_parser(build_parser()).parse_args(
        [
            "--data_dir", str(data_dir),
            "--dataset", "waterbirds",
            "--image_embedding_dir", str(tmp_path / "clip.npz"),
            "--text_embedding_dir", str(tmp_path / "clip_class.json"),
            "--text_spurious_embedding_dir", str(tmp_path / "clip_spurious.json"),
            "--text_group_embedding_dir", str(tmp_path / "clip_group.json"),
            "--tl_method", "adapter",
            "--epochs", "2",
            "--batch_size", "32",
            "--adapter_feat_dim", "8",
            "--num_iter", "2",
            "--random_seeds", "42,32",
            "--lr_list", "0.1,0.5",
            "--result_root", str(tmp_path / "sweep"),
        ]
    )
    assert sweep_main.main(args) == 0
    csvs = sorted(os.listdir(tmp_path / "sweep"))
    assert len(csvs) == 2  # one per lr
    assert any("lr_0.1" in c for c in csvs) and any("lr_0.5" in c for c in csvs)


def test_profiling_hooks(tmp_path):
    import jax.numpy as jnp

    from debiasing_multi_modal_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "trace")):
        with annotate("work"):
            jnp.arange(10).sum().block_until_ready()
    # trace directory materialized with profiler artifacts
    assert any(os.scandir(tmp_path / "trace"))
    with trace(str(tmp_path / "off"), enabled=False):
        pass
    assert not os.path.isdir(tmp_path / "off")
