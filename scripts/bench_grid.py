#!/usr/bin/env python
"""Wall-clock of the FULL reference Waterbirds sweep grid on one chip.

The reference hand-parallelizes bs{512,1024} x bsr{64,128,256,512} x
lr{1,10} x 3 seeds across GPUs (run_multiple/run_final_main_iteration_wb.sh:
22-24); here the grid executes as vmapped programs on one device, with the
lr and (optionally) bsr axes stacked into the programs themselves.  Feeds
the grid-stacking numbers in docs/DESIGN.md §4.

    python scripts/bench_grid.py [epochs] [mode...]

modes: percell | lr | lrbsr | all   (default: lr lrbsr all)
("all" stacks every axis: the whole 16-cell grid is ONE program)

BENCH_GRID_DATASET=celeba switches to the reference's CelebA grid at full
split scale (162,770 train rows; bs 1024 x bsr{4,8,16} x lr 0.1 with
lr_multiple 10 and --balance_val, run_multiple/run_final_main_iteration_ca.sh:
21-23, 2 seeds per the logged runs) — 3 cells whose stacked form is the bsr
axis only.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    modes = sys.argv[2:] or ["lr", "lrbsr", "all"]

    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from debiasing_multi_modal_tpu.data.synthetic import (
        SyntheticSpec, make_synthetic_dataset,
    )
    from debiasing_multi_modal_tpu.sweep.runner import run_sweep
    from debiasing_multi_modal_tpu.train.config import TrainConfig
    from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table

    dataset = os.environ.get("BENCH_GRID_DATASET", "waterbirds")
    if dataset == "celeba":
        spec = SyntheticSpec(dim=1024, n_train=162770, n_val=19867,
                             n_test=19962)
    else:
        spec = SyntheticSpec(dim=1024, n_train=4795, n_val=1199, n_test=5794)
    meta, table, tc, tg, ts = make_synthetic_dataset(spec)
    mbs = {
        name: meta.take(np.where(meta.split == sid)[0])
        for name, sid in (("train", 0), ("val", 1), ("test", 2))
    }
    bundle = bundle_from_embedding_table(table, mbs, tc, ts, tg)

    if dataset == "celeba":
        # the reference CA grid (run_final_main_iteration_ca.sh:21-23):
        # epochs 65 / feat-learn 40 / decay 62,64 — scaled by epochs/65
        # when a smaller epoch count is asked for
        s = epochs / 65.0
        cfg = TrainConfig(
            dataset="celeba", input_dim=1024, adapter_feat_dim=128,
            tl_method="adapter_reg_seq_alter", epochs=epochs,
            epochs_feature_learning=max(1, int(40 * s)),
            learning_rate=0.1, learning_rate_reg=0.1,
            lr_decay_rate=0.1,
            lr_decay_epochs=(max(1, int(62 * s)), max(2, int(64 * s))),
            warm_reg=True, add_adapter=True, balance_val=True,
        )
        grid = dict(
            lr_list=[0.1], bs_list=[1024], bsr_list=[4, 8, 16],
            lr_multiple=10.0,
        )
        seeds = [42, 32]
        n_cells = 3
    else:
        cfg = TrainConfig(
            dataset="waterbirds", input_dim=1024, adapter_feat_dim=128,
            tl_method="adapter_reg_seq_alter", epochs=epochs,
            epochs_feature_learning=max(1, int(epochs * 0.4)),
            learning_rate=1.0, learning_rate_reg=1.0,
            lr_decay_rate=0.1,
            lr_decay_epochs=(max(1, int(epochs * 0.9)),
                             max(2, int(epochs * 0.95))),
            warm_reg=True, add_adapter=True,
        )
        grid = dict(
            lr_list=[1.0, 10.0], bs_list=[512, 1024],
            bsr_list=[64, 128, 256, 512], lr_multiple=1.0,
        )
        seeds = [42, 32, 22]
        n_cells = 2 * 2 * 4
    flags = {
        "percell": {},
        "lr": dict(stack_lr_axis=True),
        "lrbsr": dict(stack_lr_axis=True, stack_bsr_axis=True),
        "all": dict(stack_lr_axis=True, stack_bsr_axis=True,
                    stack_bs_axis=True),
    }
    for mode in modes:
        root = tempfile.mkdtemp(prefix=f"grid_{mode}_")
        t0 = time.perf_counter()
        out = run_sweep(cfg, bundle, seeds, result_root=root,
                        **grid, **flags[mode])
        dt = time.perf_counter() - t0
        assert len(out) == n_cells, (mode, len(out))
        worst = np.mean(
            [np.mean([r[0][2]["worst_acc"] for r in res])
             for res in out.values()]
        )
        print(
            f"{mode:8s} {n_cells} cells x {len(seeds)} seeds x {epochs} ep: "
            f"{dt:7.1f} s  ({dt / (n_cells * len(seeds) * epochs) * 1e3:6.1f}"
            f" ms/seed-epoch)  mean-worst {worst:.3f}"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
