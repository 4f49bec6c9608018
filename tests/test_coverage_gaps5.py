"""Fifth coverage-gap batch: extract-CLI integration paths — loading a real
TorchScript-archive checkpoint (`--checkpoint`, the day-one command), BN
folding through the CLI (`--fuse_bn` + its ViT rejection), the CelebA disk
layout, crash-safe shard resume via flags, and the tensor-parallel
divisibility guard.  Reference surfaces: clip/clip.py:94-194 (load),
clip_inference.py:274-286 (argparse), data/celeba.py:15-68 (layout).
"""

import importlib.util
import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from debiasing_multi_modal_tpu.cli import extract_main
from debiasing_multi_modal_tpu.models.config import CLIPConfig
from debiasing_multi_modal_tpu.weights.convert import save_jit_state_dict_archive

REFERENCE_MODEL = "/root/reference/clip/model.py"

TINY_VIT = CLIPConfig(
    name="ViT-B/32", embed_dim=32, image_resolution=64,
    vision_layers=1, vision_width=64, vision_patch_size=32,
    transformer_width=64, transformer_heads=1, transformer_layers=1,
)


def _reference_module():
    spec = importlib.util.spec_from_file_location("ref_clip_model_cg5", REFERENCE_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_rn_archive(tmp_path):
    """A toy-width reference ModifiedResNet CLIP in the TorchScript-archive
    layout OpenAI distributes (shape-sniffable end to end)."""
    ref = _reference_module()
    with torch.no_grad():
        model = ref.CLIP(
            embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1),
            vision_width=8, vision_patch_size=None, context_length=77,
            vocab_size=49408, transformer_width=64, transformer_heads=1,
            transformer_layers=1,
        ).eval()
    path = str(tmp_path / "tiny_rn.pt")
    save_jit_state_dict_archive(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, path
    )
    return path


def _write_waterbirds_tree(tmp_path, n_per_split=4, res=64):
    from PIL import Image

    root = tmp_path / "waterbirds" / "waterbird_complete95_forest2water2"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["img_id,img_filename,y,split,place"]
    k = 0
    for split in range(3):
        for _ in range(n_per_split):
            fn = f"imgs/{k:05d}.jpg"
            arr = (rng.random((res, res, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / fn)
            rows.append(
                f"{k},{fn},{int(rng.integers(0, 2))},{split},{int(rng.integers(0, 2))}"
            )
            k += 1
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")


def _write_celeba_tree(tmp_path, n=9, res=64):
    from PIL import Image

    root = tmp_path / "celeba"
    img_dir = root / "img_align_celeba" / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    attrs = ["image_id,Blond_Hair,Male"]
    parts = ["image_id,partition"]
    for i in range(n):
        fn = f"{i:06d}.jpg"
        arr = (rng.random((res, res, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / fn)
        attrs.append(f"{fn},{rng.choice([-1, 1])},{rng.choice([-1, 1])}")
        parts.append(f"{fn},{i % 3}")
    (root / "list_attr_celeba.csv").write_text("\n".join(attrs) + "\n")
    (root / "list_eval_partition.csv").write_text("\n".join(parts) + "\n")


def _args(tmp_path, **over):
    base = {
        "--data_dir": str(tmp_path),
        "--dataset": "waterbirds",
        "--split": "all",
        "--backbone": "RN50",
        "--embedding_dir": "emb",
        "--batch_size": "4",
        "--host_resolution": "64",
    }
    flags = []
    for k, v in {**base, **{k: v for k, v in over.items() if v is not None}}.items():
        if v == "":
            flags.append(k)
        else:
            flags.extend([k, v])
    flags.append("--save")
    return extract_main.build_parser().parse_args(flags)


def _patch_tiny_vit(monkeypatch):
    import debiasing_multi_modal_tpu.models as models_pkg

    real_create = models_pkg.create_clip

    def fake_create(name_or_config, dtype=None, **kw):
        return real_create(TINY_VIT, **kw)

    monkeypatch.setitem(
        sys.modules["debiasing_multi_modal_tpu.models"].__dict__,
        "create_clip",
        fake_create,
    )


def test_extract_cli_checkpoint_and_fuse_bn(tmp_path):
    """--checkpoint loads the TorchScript archive, sniffs the architecture,
    and --fuse_bn folds the frozen BNs — the complete day-one Stage A
    command, numerics checked fold-vs-unfolded."""
    _write_waterbirds_tree(tmp_path)
    ckpt = _tiny_rn_archive(tmp_path)

    extract_main.main(_args(tmp_path, **{"--checkpoint": ckpt}))
    plain = np.load(tmp_path / "emb" / "waterbirds" / "RN50" / "clip.npz")

    extract_main.main(
        _args(
            tmp_path,
            **{"--checkpoint": ckpt, "--fuse_bn": "", "--embedding_dir": "emb_f"}
        )
    )
    folded = np.load(tmp_path / "emb_f" / "waterbirds" / "RN50" / "clip.npz")
    assert plain["embeddings"].shape == (12, 32)
    # folded-BN inference must reproduce the unfolded embeddings
    np.testing.assert_allclose(
        folded["embeddings"], plain["embeddings"], rtol=5e-2, atol=5e-3
    )
    np.testing.assert_array_equal(folded["y_pred"], plain["y_pred"])


def test_extract_cli_fuse_bn_rejects_vit(tmp_path, monkeypatch):
    _write_waterbirds_tree(tmp_path)
    _patch_tiny_vit(monkeypatch)
    with pytest.raises(SystemExit, match="ResNet"):
        extract_main.main(
            _args(tmp_path, **{"--backbone": "ViT-B/32", "--fuse_bn": ""})
        )


def test_extract_cli_tensor_parallel_divisibility(tmp_path, monkeypatch):
    _write_waterbirds_tree(tmp_path)
    _patch_tiny_vit(monkeypatch)
    with pytest.raises(SystemExit, match="does not divide"):
        extract_main.main(
            _args(
                tmp_path,
                **{"--backbone": "ViT-B/32", "--tensor_parallel": "3"},
            )
        )


def test_extract_cli_celeba_layout(tmp_path, monkeypatch):
    _write_celeba_tree(tmp_path)
    _patch_tiny_vit(monkeypatch)
    extract_main.main(
        _args(tmp_path, **{"--dataset": "celeba", "--backbone": "ViT-B/32"})
    )
    out = tmp_path / "emb" / "celeba" / "ViT-B-32"
    assert (out / "clip.npz").is_file()
    raw = json.loads((out / "clip.json").read_text())
    rec = next(iter(raw.values()))
    assert "blond" in rec and "male" in rec  # celeba key schema


def test_extract_cli_shard_resume_produces_identical_cache(tmp_path, monkeypatch):
    _write_waterbirds_tree(tmp_path)
    _patch_tiny_vit(monkeypatch)
    kw = {"--backbone": "ViT-B/32", "--shard_every": "1"}
    extract_main.main(_args(tmp_path, **kw))
    first = np.load(tmp_path / "emb" / "waterbirds" / "ViT-B-32" / "clip.npz")
    emb1 = first["embeddings"].copy()
    # second run resumes past the completed shards and must reproduce the
    # merged cache byte-for-byte
    extract_main.main(_args(tmp_path, **kw))
    second = np.load(tmp_path / "emb" / "waterbirds" / "ViT-B-32" / "clip.npz")
    np.testing.assert_array_equal(second["embeddings"], emb1)
