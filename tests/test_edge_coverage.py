"""Edge coverage: CelebA metadata parsing, multi-milestone LR decay,
run-name encodings across the flag matrix, CelebA minority semantics."""

import numpy as np
import pytest

from debiasing_multi_modal_tpu.data.groups import load_celeba_metadata
from debiasing_multi_modal_tpu.extract.runner import minority_report
from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.loop import encode_run_name
from debiasing_multi_modal_tpu.train.schedules import epoch_lr, epoch_lr_reg


def _write_celeba_csvs(tmp_path, n=12):
    rng = np.random.default_rng(0)
    attrs = ["image_id,Blond_Hair,Male,Smiling"]
    parts = ["image_id,partition"]
    for i in range(n):
        blond = rng.choice([-1, 1])
        male = rng.choice([-1, 1])
        attrs.append(f"{i:06d}.jpg,{blond},{male},1")
        parts.append(f"{i:06d}.jpg,{i % 3}")
    (tmp_path / "list_attr_celeba.csv").write_text("\n".join(attrs) + "\n")
    (tmp_path / "list_eval_partition.csv").write_text("\n".join(parts) + "\n")


def test_celeba_metadata_parsing(tmp_path):
    _write_celeba_csvs(tmp_path)
    full = load_celeba_metadata(str(tmp_path))
    assert len(full) == 12
    # -1 attributes remapped to 0 (reference data/celeba.py:27-30)
    assert set(np.unique(full.y)) <= {0, 1}
    assert set(np.unique(full.place)) <= {0, 1}
    assert (full.group == full.y * 2 + full.place).all()
    val = load_celeba_metadata(str(tmp_path), "val")
    assert (val.split == 1).all() and len(val) == 4


def test_celeba_metadata_order_mismatch_raises(tmp_path):
    _write_celeba_csvs(tmp_path)
    # shuffle the partition file's rows -> misaligned image ids
    lines = (tmp_path / "list_eval_partition.csv").read_text().strip().split("\n")
    (tmp_path / "list_eval_partition.csv").write_text(
        "\n".join([lines[0]] + lines[2:] + [lines[1]]) + "\n"
    )
    with pytest.raises(ValueError, match="disagree"):
        load_celeba_metadata(str(tmp_path))


def test_multi_milestone_decay():
    cfg = TrainConfig(
        epochs=100, learning_rate=1.0, lr_decay_epochs=(60, 75, 90),
        lr_decay_rate=0.1,
    )
    assert epoch_lr(cfg, 60) == pytest.approx(1.0)  # boundary: epoch > milestone
    assert epoch_lr(cfg, 61) == pytest.approx(0.1)
    assert epoch_lr(cfg, 76) == pytest.approx(0.01)
    assert epoch_lr(cfg, 91) == pytest.approx(0.001)
    cfg_reg = cfg.replace(
        learning_rate_reg=2.0, tl_method="adapter_reg_seq",
        epochs_feature_learning=40,
    )
    assert epoch_lr_reg(cfg_reg, 91) == pytest.approx(2.0 * 1e-3)


def test_run_name_flag_matrix():
    base = dict(
        epochs=4, learning_rate=1.0, batch_size=1024,
        learning_rate_reg=1.0, batch_size_reg=256,
    )
    gp = TrainConfig(
        tl_method="adapter_reg_seq", epochs_feature_learning=2, **base
    )
    assert encode_run_name(gp).endswith("_lrr1.0_bsr_256_GP")
    cp = gp.replace(use_cls_prompt_in_reg=True)
    assert encode_run_name(cp).endswith("_CP")
    cont = gp.replace(continue_from_best=True)
    assert encode_run_name(cont).endswith("_GP_cont")
    rs = TrainConfig(tl_method="adapter", resample_ce=True, **base)
    assert encode_run_name(rs).endswith("_rs")


def test_celeba_minority_report_semantics(rng):
    # celeba minority = blond man: (y==1) & (place==1)
    y = np.array([0, 0, 1, 1])
    place = np.array([0, 1, 0, 1])
    preds = np.array([0, 1, 1, 1])
    report = minority_report(y, place, preds, "celeba")
    assert isinstance(report, str) and len(report) > 0
    with pytest.raises(ValueError):
        minority_report(y, place, preds, "imagenet")
