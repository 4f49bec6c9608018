"""CLI integration tests: a miniature on-disk dataset flows through the
extraction CLI and the training CLI end-to-end (the reference's
save_embedding.sh -> run_final_main.sh pipeline, at toy scale)."""

import json
import os
import sys

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.embeddings_store import (
    save_embeddings,
    save_text_embeddings,
)
from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset


def _write_waterbirds_tree(tmp_path, n_per_split=12, res=64):
    """Images + metadata.csv in the waterbirds on-disk layout."""
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path / "waterbirds" / "waterbird_complete95_forest2water2"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["img_id,img_filename,y,split,place"]
    k = 0
    for split in range(3):
        for i in range(n_per_split):
            fn = f"imgs/{k:05d}.jpg"
            arr = (rng.random((res + 8, res + 16, 3)) * 255).astype(np.uint8)
            PIL.fromarray(arr).save(root / fn)
            y, place = int(rng.integers(0, 2)), int(rng.integers(0, 2))
            rows.append(f"{k},{fn},{y},{split},{place}")
            k += 1
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    return root


def test_extract_cli_end_to_end(tmp_path, monkeypatch):
    from debiasing_multi_modal_tpu.cli import extract_main

    _write_waterbirds_tree(tmp_path)
    args = extract_main.build_parser().parse_args(
        [
            "--data_dir", str(tmp_path),
            "--dataset", "waterbirds",
            "--split", "all",
            "--backbone", "RN50",
            "--embedding_dir", "embeddings_unnormalized",
            "--save",
            "--batch_size", "8",
            "--host_resolution", "64",
        ]
    )
    # shrink the model: monkeypatch the registry call to a tiny RN config
    from debiasing_multi_modal_tpu.models.config import CLIPConfig

    tiny = CLIPConfig(
        name="RN50", embed_dim=32, image_resolution=64,
        vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
        transformer_width=64, transformer_heads=1, transformer_layers=1,
    )
    import debiasing_multi_modal_tpu.models as models_pkg

    real_create = models_pkg.create_clip

    def fake_create(name_or_config, dtype=None, **kw):
        return real_create(tiny)

    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__, "create_clip", fake_create
    )
    extract_main.main(args)

    emb_root = tmp_path / "embeddings_unnormalized" / "waterbirds"
    for kind in ("class", "spurious", "group"):
        assert (emb_root / f"clip_{kind}.json").is_file()
    out = emb_root / "RN50"
    assert (out / "clip.json").is_file() and (out / "clip.npz").is_file()
    raw = json.loads((out / "clip.json").read_text())
    assert len(raw) == 36
    rec = next(iter(raw.values()))
    assert len(rec["image_embedding"]) == 32


def test_train_cli_end_to_end(tmp_path, capsys):
    from debiasing_multi_modal_tpu.cli import train_main
    from debiasing_multi_modal_tpu.templates import WATERBIRDS

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=64, n_val=32, n_test=32, dim=32)
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rows = ["img_id,img_filename,y,split,place"]
    for i in range(len(meta)):
        rows.append(
            f"{i},{meta.filenames[i]},{meta.y[i]},{meta.split[i]},{meta.place[i]}"
        )
    (data_dir / "metadata.csv").write_text("\n".join(rows) + "\n")

    save_embeddings(str(tmp_path / "clip.npz"), table)
    save_text_embeddings(str(tmp_path / "clip_class.json"), WATERBIRDS.prompts("class"), tc.T)
    save_text_embeddings(
        str(tmp_path / "clip_spurious.json"), WATERBIRDS.prompts("spurious"), ts.T
    )
    save_text_embeddings(str(tmp_path / "clip_group.json"), WATERBIRDS.prompts("group"), tg.T)

    args = train_main.build_parser().parse_args(
        [
            "--data_dir", str(data_dir),
            "--dataset", "waterbirds",
            "--image_embedding_dir", str(tmp_path / "clip.npz"),
            "--text_embedding_dir", str(tmp_path / "clip_class.json"),
            "--text_spurious_embedding_dir", str(tmp_path / "clip_spurious.json"),
            "--text_group_embedding_dir", str(tmp_path / "clip_group.json"),
            "--tl_method", "adapter_reg_seq_alter",
            "--epochs", "4",
            "--epochs_feature_learning", "2",
            "--batch_size", "32",
            "--batch_size_reg", "8",
            "--learning_rate", "0.5",
            "--learning_rate_reg", "0.5",
            "--adapter_feat_dim", "8",
            "--add_adapter",
            "--save_results",
            "--results_dir", str(tmp_path / "results"),
        ]
    )
    assert train_main.main(args) == 0
    out = capsys.readouterr().out
    assert "best test:" in out
    saved = list((tmp_path / "results").glob("*.json"))
    assert len(saved) == 1
    payload = json.loads(saved[0].read_text())
    assert "Final Results (best epoch)" in payload


def test_sweep_cli_end_to_end(tmp_path):
    """sweep_main drives the vmapped multi-seed grid and writes the
    reference-schema CSV (final_main_iteration_wb.py CLI surface)."""
    from debiasing_multi_modal_tpu.cli import sweep_main
    from debiasing_multi_modal_tpu.templates import WATERBIRDS

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=64, n_val=32, n_test=32, dim=32)
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rows = ["img_id,img_filename,y,split,place"]
    for i in range(len(meta)):
        rows.append(
            f"{i},{meta.filenames[i]},{meta.y[i]},{meta.split[i]},{meta.place[i]}"
        )
    (data_dir / "metadata.csv").write_text("\n".join(rows) + "\n")
    save_embeddings(str(tmp_path / "clip.npz"), table)
    save_text_embeddings(str(tmp_path / "clip_class.json"), WATERBIRDS.prompts("class"), tc.T)
    save_text_embeddings(str(tmp_path / "clip_spurious.json"), WATERBIRDS.prompts("spurious"), ts.T)
    save_text_embeddings(str(tmp_path / "clip_group.json"), WATERBIRDS.prompts("group"), tg.T)

    args = sweep_main.extend_parser(sweep_main.build_parser()).parse_args(
        [
            "--data_dir", str(data_dir),
            "--dataset", "waterbirds",
            "--image_embedding_dir", str(tmp_path / "clip.npz"),
            "--text_embedding_dir", str(tmp_path / "clip_class.json"),
            "--text_spurious_embedding_dir", str(tmp_path / "clip_spurious.json"),
            "--text_group_embedding_dir", str(tmp_path / "clip_group.json"),
            "--tl_method", "adapter",
            "--epochs", "3",
            "--adapter_feat_dim", "8",
            "--num_iter", "2", "--random_seeds", "42,32",
            "--lr_list", "0.5", "--bs_list", "32", "--bsr_list", "8",
            "--result_root", str(tmp_path / "results_iterative"),
        ]
    )
    assert sweep_main.main(args) == 0
    csvs = list((tmp_path / "results_iterative").glob("*.csv"))
    assert len(csvs) == 1
    lines = csvs[0].read_text().strip().split("\n")
    assert "worst_acc" in lines[0]
    assert any(ln.startswith("test_mean,") for ln in lines)


def test_sweep_cli_seed_mesh_matches_unsharded(tmp_path):
    """--seed_mesh shards the seed axis over the 8-device mesh through the
    FULL CLI path; the written CSV must be byte-identical to the unsharded
    run (sweep_main.py's make_mesh branch)."""
    from debiasing_multi_modal_tpu.cli import sweep_main
    from debiasing_multi_modal_tpu.templates import WATERBIRDS

    meta, table, tc, tg, ts = make_synthetic_dataset(
        SyntheticSpec(n_train=64, n_val=32, n_test=32, dim=32)
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rows = ["img_id,img_filename,y,split,place"]
    for i in range(len(meta)):
        rows.append(
            f"{i},{meta.filenames[i]},{meta.y[i]},{meta.split[i]},{meta.place[i]}"
        )
    (data_dir / "metadata.csv").write_text("\n".join(rows) + "\n")
    save_embeddings(str(tmp_path / "clip.npz"), table)
    save_text_embeddings(str(tmp_path / "clip_class.json"), WATERBIRDS.prompts("class"), tc.T)
    save_text_embeddings(str(tmp_path / "clip_spurious.json"), WATERBIRDS.prompts("spurious"), ts.T)
    save_text_embeddings(str(tmp_path / "clip_group.json"), WATERBIRDS.prompts("group"), tg.T)

    seeds = ",".join(str(40 + i) for i in range(8))  # 8 seeds / 8 devices
    base = [
        "--data_dir", str(data_dir),
        "--dataset", "waterbirds",
        "--image_embedding_dir", str(tmp_path / "clip.npz"),
        "--text_embedding_dir", str(tmp_path / "clip_class.json"),
        "--text_spurious_embedding_dir", str(tmp_path / "clip_spurious.json"),
        "--text_group_embedding_dir", str(tmp_path / "clip_group.json"),
        "--tl_method", "adapter",
        "--epochs", "2",
        "--adapter_feat_dim", "8",
        "--num_iter", "8", "--random_seeds", seeds,
        "--lr_list", "0.5", "--bs_list", "32", "--bsr_list", "8",
    ]
    parser = sweep_main.extend_parser(sweep_main.build_parser())
    for extra in (["--result_root", str(tmp_path / "plain")],
                  ["--result_root", str(tmp_path / "meshed"), "--seed_mesh"]):
        assert sweep_main.main(parser.parse_args(base + extra)) == 0
    plain = list((tmp_path / "plain").glob("*.csv"))
    meshed = list((tmp_path / "meshed").glob("*.csv"))
    assert len(plain) == 1 and len(meshed) == 1
    assert plain[0].read_text() == meshed[0].read_text()


def test_shell_scripts_are_valid_bash():
    import glob
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = glob.glob(os.path.join(repo, "scripts", "*.sh"))
    assert scripts
    for s in scripts:
        proc = subprocess.run(["bash", "-n", s], capture_output=True, text=True)
        assert proc.returncode == 0, f"{s}: {proc.stderr}"


def test_extract_cli_tensor_parallel(tmp_path, monkeypatch):
    """--tensor_parallel 2 on the 8-device CPU mesh: same outputs as dp-only,
    through the full CLI path (dp=4 x tp=2 mesh, Megatron param sharding)."""
    from debiasing_multi_modal_tpu.cli import extract_main
    from debiasing_multi_modal_tpu.models.config import CLIPConfig

    _write_waterbirds_tree(tmp_path)
    tiny = CLIPConfig(
        name="RN50", embed_dim=32, image_resolution=64,
        vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
        transformer_width=128, transformer_heads=2, transformer_layers=1,
    )
    import debiasing_multi_modal_tpu.models as models_pkg

    real_create = models_pkg.create_clip
    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__,
        "create_clip",
        lambda name_or_config, dtype=None, **kw: real_create(tiny),
    )

    def run(edir, tp):
        argv = [
            "--data_dir", str(tmp_path), "--dataset", "waterbirds",
            "--split", "test", "--backbone", "RN50",
            "--embedding_dir", edir, "--save",
            "--batch_size", "8", "--host_resolution", "64",
            "--format", "npz",
        ]
        if tp > 1:
            argv += ["--tensor_parallel", str(tp)]
        extract_main.main(extract_main.build_parser().parse_args(argv))

    run("emb_dp", 1)
    run("emb_tp", 2)
    a = np.load(tmp_path / "emb_dp" / "waterbirds" / "RN50" / "clip.npz")
    b = np.load(tmp_path / "emb_tp" / "waterbirds" / "RN50" / "clip.npz")
    np.testing.assert_allclose(
        b["embeddings"], a["embeddings"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(b["y_pred"], a["y_pred"])


def test_extract_cli_quantize_int8(tmp_path, monkeypatch):
    """--quantize int8 through the full CLI path (tiny ViT): embeddings stay
    within the W8A8 bound of the unquantized run; RN backbones are rejected."""
    import pytest

    from debiasing_multi_modal_tpu.cli import extract_main
    from debiasing_multi_modal_tpu.models.config import CLIPConfig

    _write_waterbirds_tree(tmp_path)
    tiny = CLIPConfig(
        name="ViT-B/32", embed_dim=32, image_resolution=64,
        vision_layers=1, vision_width=64, vision_patch_size=16,
        transformer_width=64, transformer_heads=1, transformer_layers=1,
    )
    import debiasing_multi_modal_tpu.models as models_pkg

    real_create = models_pkg.create_clip
    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__,
        "create_clip",
        lambda name_or_config, dtype=None, **kw: real_create(
            tiny, quant=kw.get("quant", "none")
        ),
    )

    def run(edir, quant):
        argv = [
            "--data_dir", str(tmp_path), "--dataset", "waterbirds",
            "--split", "test", "--backbone", "ViT-B/32",
            "--embedding_dir", edir, "--save",
            "--batch_size", "8", "--host_resolution", "64",
            "--format", "npz", "--quantize", quant,
        ]
        extract_main.main(extract_main.build_parser().parse_args(argv))

    run("emb_fp", "none")
    run("emb_q", "int8")
    a = np.load(tmp_path / "emb_fp" / "waterbirds" / "ViT-B-32" / "clip.npz")
    b = np.load(tmp_path / "emb_q" / "waterbirds" / "ViT-B-32" / "clip.npz")
    ea, eb = a["embeddings"].astype(np.float64), b["embeddings"].astype(np.float64)
    cos = (ea * eb).sum(-1) / (
        np.linalg.norm(ea, axis=-1) * np.linalg.norm(eb, axis=-1)
    )
    assert cos.min() > 0.99, cos

    # RN backbones must be rejected loudly
    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__,
        "create_clip", real_create,
    )
    rn_tiny = CLIPConfig(
        name="RN50", embed_dim=32, image_resolution=64,
        vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
        transformer_width=64, transformer_heads=1, transformer_layers=1,
    )
    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__,
        "create_clip",
        lambda name_or_config, dtype=None, **kw: real_create(rn_tiny),
    )
    with pytest.raises(SystemExit, match="ViT backbones only"):
        run("emb_rn", "int8")


def test_sweep_cli_rejects_unwired_flags(tmp_path):
    """num_iter beyond the seed list, and train-only flags, must fail loudly
    instead of silently truncating the sweep / producing nothing."""
    import pytest

    from debiasing_multi_modal_tpu.cli.sweep_main import extend_parser
    from debiasing_multi_modal_tpu.cli.train_main import build_parser
    from debiasing_multi_modal_tpu.cli import sweep_main

    req = [
        "--data_dir", str(tmp_path),
        "--image_embedding_dir", "e.npz", "--text_embedding_dir", "t.json",
        "--text_group_embedding_dir", "g.json",
        "--text_spurious_embedding_dir", "s.json",
    ]

    def run(extra):
        args = extend_parser(build_parser()).parse_args(req + extra)
        sweep_main.main(args)

    with pytest.raises(SystemExit, match="num_iter"):
        run(["--num_iter", "5", "--random_seeds", "42,32"])
    with pytest.raises(SystemExit, match="checkpoint_dir"):
        run(["--checkpoint_dir", "x"])
    with pytest.raises(SystemExit, match="save_results"):
        run(["--save_results"])
