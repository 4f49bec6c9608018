#!/usr/bin/env python
"""Wall-clock of the vmapped multi-seed sweep at real-dataset scale on TPU.

Runs the best two-phase config (seq-alter + MultipleAdapter, bs 1024,
bsr 256) over a synthetic bundle shaped like the real dataset for the given
seed counts and prints seconds per run.  Feeds the vmap-scaling numbers in
docs/DESIGN.md §4.

    python scripts/bench_sweep.py [epochs] [seed_counts...]

Set BENCH_SWEEP_DATASET=celeba for CelebA split sizes (162,770 train —
BASELINE config 2); default is Waterbirds (4,795 / 1,199 / 5,794, D=1024).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALES = {
    # name -> (n_train, n_val, n_test); D=1024 (RN50 embedding width)
    "waterbirds": (4795, 1199, 5794),
    "celeba": (162770, 19867, 19962),
}


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed_counts = [int(a) for a in sys.argv[2:]] or [3, 32]
    dataset = os.environ.get("BENCH_SWEEP_DATASET", "waterbirds")
    n_train, n_val, n_test = SCALES[dataset]

    from debiasing_multi_modal_tpu.data.groups import GroupTable
    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from debiasing_multi_modal_tpu.data.synthetic import (
        SyntheticSpec, make_synthetic_dataset,
    )
    from debiasing_multi_modal_tpu.sweep.runner import run_seeds
    from debiasing_multi_modal_tpu.train.config import TrainConfig
    from debiasing_multi_modal_tpu.train.loop import bundle_from_embedding_table

    spec = SyntheticSpec(dim=1024, n_train=n_train, n_val=n_val, n_test=n_test)
    meta, table, tc, tg, ts = make_synthetic_dataset(spec)
    mbs = {
        name: GroupTable(
            filenames=meta.filenames[meta.split == sid],
            y=meta.y[meta.split == sid],
            place=meta.place[meta.split == sid],
            split=meta.split[meta.split == sid],
        )
        for name, sid in (("train", 0), ("val", 1), ("test", 2))
    }
    bundle = bundle_from_embedding_table(table, mbs, tc, ts, tg)

    cfg = TrainConfig(
        dataset=dataset, input_dim=1024, adapter_feat_dim=128,
        tl_method="adapter_reg_seq_alter", epochs=epochs,
        epochs_feature_learning=epochs // 2,
        batch_size=1024, batch_size_reg=256,
        learning_rate=1.0, learning_rate_reg=1.0,
        lr_decay_epochs=(max(1, int(epochs * 0.9)), max(2, int(epochs * 0.95))),
        add_adapter=True, init_near_identity=True, continue_from_best=True,
    )

    for s in seed_counts:
        seeds = list(range(42, 42 + s))
        t0 = time.perf_counter()
        res = run_seeds(cfg, bundle, seeds, use_vmap=True)
        dt = time.perf_counter() - t0
        worst = [r[0][2]["worst_acc"] for r in res]
        print(
            f"seeds={s:3d}  {dt:7.1f} s total  {dt / epochs:6.2f} s/epoch  "
            f"{dt / (s * epochs):7.3f} s/seed-epoch  "
            f"test worst mean {np.mean(worst):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
