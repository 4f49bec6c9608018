"""Schedule parity vs. the reference's LR adjustment functions
(demo/util.py:70-115), driven through a fake optimizer."""

import importlib.util
import os
import types

import numpy as np
import pytest

from debiasing_multi_modal_tpu.train.config import TrainConfig
from debiasing_multi_modal_tpu.train.schedules import (
    batch_lr,
    batch_lr_reg,
    epoch_batch_lrs,
    epoch_lr,
    epoch_lr_reg,
)

REFERENCE_UTIL = "/root/reference/demo/util.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE_UTIL), reason="reference tree not mounted"
)


class FakeOptimizer:
    def __init__(self, lr):
        self.param_groups = [{"lr": lr}]

    @property
    def lr(self):
        return self.param_groups[0]["lr"]


def _ref_util():
    spec = importlib.util.spec_from_file_location("ref_util", REFERENCE_UTIL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_args(cfg: TrainConfig):
    ns = types.SimpleNamespace(
        learning_rate=cfg.learning_rate,
        learning_rate_reg=cfg.learning_rate_reg,
        lr_decay_epochs=list(cfg.lr_decay_epochs),
        lr_decay_rate=cfg.lr_decay_rate,
        cosine=cfg.cosine,
        epochs=cfg.epochs,
        warm=cfg.warm,
        warm_reg=cfg.warm_reg,
    )
    if cfg.warm:
        ns.warm_epochs = cfg.warm_epochs
        ns.warmup_from = cfg.warmup_from
        ns.warmup_to = cfg.warmup_to
    if cfg.warm_reg:
        ns.warm_epochs_reg = cfg.warm_epochs_reg
        ns.warmup_from_reg = cfg.warmup_from_reg
        ns.warmup_to_reg = cfg.warmup_to_reg
    return ns


def _best_wb_config():
    """The reference's best Waterbirds hyperparameters (run_final_main.sh)."""
    return TrainConfig(
        epochs=100,
        epochs_feature_learning=40,
        learning_rate=1.0,
        learning_rate_reg=1.0,
        lr_decay_epochs=(90, 95),
        lr_decay_rate=0.1,
        warm_reg=True,
        batch_size=1024,
        batch_size_reg=256,
        tl_method="adapter_reg_seq_alter",
        add_adapter=True,
    )


def test_epoch_lr_step_decay_matches_reference():
    ref = _ref_util()
    cfg = _best_wb_config()
    args = _ref_args(cfg)
    for epoch in range(1, 101):
        opt = FakeOptimizer(0.0)
        ref.adjust_learning_rate(args, opt, epoch)
        assert epoch_lr(cfg, epoch) == pytest.approx(opt.lr), epoch


def test_epoch_lr_reg_matches_reference():
    ref = _ref_util()
    cfg = _best_wb_config()
    args = _ref_args(cfg)
    for epoch in range(41, 101):
        opt = FakeOptimizer(0.0)
        ref.adjust_learning_rate_reg(args, opt, epoch)
        assert epoch_lr_reg(cfg, epoch) == pytest.approx(opt.lr), epoch


def test_warmup_matches_reference():
    ref = _ref_util()
    cfg = _best_wb_config().replace(warm=True)
    args = _ref_args(cfg)
    total_batches = 5
    for epoch in (1, 3, 10, 11):
        for b in range(total_batches):
            opt = FakeOptimizer(epoch_lr(cfg, epoch))
            ref.warmup_learning_rate(args, epoch, b, total_batches, opt)
            assert batch_lr(cfg, epoch, b, total_batches) == pytest.approx(opt.lr)


def test_warmup_reg_matches_reference():
    ref = _ref_util()
    cfg = _best_wb_config()
    args = _ref_args(cfg)
    total_batches = 3
    for epoch in (41, 45, 50, 51, 99):
        for b in range(total_batches):
            opt = FakeOptimizer(epoch_lr_reg(cfg, epoch))
            # the loop passes epoch - epochs_feature_learning (final_main.py:607)
            ref.warmup_learning_rate_reg(args, epoch - 40, b, total_batches, opt)
            assert batch_lr_reg(cfg, epoch, b, total_batches) == pytest.approx(opt.lr)


def test_cosine_schedule_matches_reference():
    ref = _ref_util()
    cfg = TrainConfig(epochs=50, learning_rate=0.5, lr_decay_rate=0.1, cosine=True)
    args = _ref_args(cfg)
    for epoch in range(1, 51):
        opt = FakeOptimizer(0.0)
        ref.adjust_learning_rate(args, opt, epoch)
        assert epoch_lr(cfg, epoch) == pytest.approx(opt.lr)


def test_epoch_batch_lrs_vector():
    cfg = _best_wb_config()
    lrs = epoch_batch_lrs(cfg, 41, 3, phase=2)
    assert lrs.shape == (3,)
    # reg warmup active in epoch 41 (rel epoch 1 of 10)
    assert lrs[0] == pytest.approx(cfg.warmup_from_reg)
    assert np.all(np.diff(lrs) > 0)
