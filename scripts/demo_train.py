#!/usr/bin/env python
"""Executable demo (the reference's demo/demo_train.ipynb equivalent):
runs the full two-phase debiasing method on the synthetic spurious-correlation
fixture end-to-end, prints the per-epoch trajectory, and renders the
embedding-space panels before/after adaptation.

    python scripts/demo_train.py [--epochs 24] [--out /tmp/demo]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from debiasing_multi_modal_tpu.utils.compilation_cache import enable_persistent_cache
from debiasing_multi_modal_tpu.utils.platform import apply_platform_env

apply_platform_env()
enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--feature_epochs", type=int, default=6)
    ap.add_argument("--out", default="/tmp/debias_demo")
    args = ap.parse_args()

    from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
    from debiasing_multi_modal_tpu.train.config import TrainConfig
    from debiasing_multi_modal_tpu.train.loop import (
        bundle_from_embedding_table,
        train_all_epochs,
    )
    from debiasing_multi_modal_tpu.train.metrics import ordered
    from debiasing_multi_modal_tpu.viz.plots import plot_splits

    os.makedirs(args.out, exist_ok=True)
    meta, table, tc, tg, ts = make_synthetic_dataset(SyntheticSpec())
    mbs = {
        n: meta.take(np.where(meta.split == s)[0])
        for n, s in (("train", 0), ("val", 1), ("test", 2))
    }
    bundle = bundle_from_embedding_table(table, mbs, tc, ts, tg)

    base = dict(
        dataset="waterbirds", input_dim=64, adapter_feat_dim=16,
        batch_size=128, batch_size_reg=32, learning_rate=0.5,
        learning_rate_reg=0.5, lr_decay_epochs=(1000,),
    )

    print("=== ERM adapter (biased) ===")
    erm = TrainConfig(tl_method="adapter", epochs=args.feature_epochs, **base)
    (_, _, te_erm), _, _ = train_all_epochs(erm, bundle, verbose=False)
    print("ERM test:", te_erm)

    print("=== GCP-Seq-MA (debiased) ===")
    cfg = TrainConfig(
        tl_method="adapter_reg_seq_alter", epochs=args.epochs,
        epochs_feature_learning=args.feature_epochs,
        add_adapter=True, init_near_identity=True, continue_from_best=True,
        balance_val=True, **base,
    )
    ckdir = os.path.join(args.out, "ckpt")
    (tr, va, te), (zs_c, zs_s), hist = train_all_epochs(
        cfg, bundle, verbose=False, checkpoint_dir=ckdir, checkpoint_every=0,
    )
    for i, t in enumerate(hist["test"]):
        marker = " <== phase 2" if i + 1 == args.feature_epochs + 1 else ""
        print(f"epoch {i+1:3d}  test worst {t['worst_acc']:.4f}  mean {t['mean_acc']:.4f}{marker}")
    print("best test:", ordered(te))
    print(f"worst-group: ERM {te_erm['worst_acc']:.4f} -> debiased {te['worst_acc']:.4f}")

    # embedding panels colored by group: raw AND the trained best model's
    # adapted features (re-loaded from the final checkpoint — the "after
    # adaptation" panel the docstring promises)
    from debiasing_multi_modal_tpu.models.adapter import AdapterMLP
    from debiasing_multi_modal_tpu.train import checkpoint as ckpt
    from debiasing_multi_modal_tpu.viz.analysis import adapted_embeddings

    _, tree, meta = ckpt.load_checkpoint(ckpt.latest_checkpoint(ckdir))
    if "best_params" in tree:
        bp, bstats = tree["best_params"], tree["best_stats"]
    else:
        # degenerate short runs may never improve val-worst; fall back to
        # the final model (the loop's own degenerate-run fallback)
        final = tree.get("ma_state", tree["state"])
        bp, bstats = final["params"], final["batch_stats"]
    mlp = AdapterMLP(hidden_dim=base["adapter_feat_dim"])

    def _norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)

    if "old" in bp:  # MultipleAdapter best: the trained 0.5/0.5 blend
        adapted = 0.5 * _norm(
            adapted_embeddings(mlp, bp["old"], bstats["old"], table.embeddings)
        ) + 0.5 * _norm(
            adapted_embeddings(mlp, bp["new"], bstats["new"], table.embeddings)
        )
    else:
        adapted = adapted_embeddings(
            mlp, bp["adapter"], bstats["adapter"], table.embeddings
        )

    splits, labels = {}, {}
    for name, sid, emb in (
        ("train", 0, table.embeddings),
        ("test", 2, table.embeddings),
        ("test (adapted)", 2, adapted),
    ):
        idx = np.where(table.split == sid)[0]
        splits[name] = emb[idx]
        labels[name] = {
            "group": table.group[idx], "target": table.y[idx],
            "spurious": table.place[idx], "prediction": table.y_pred[idx],
        }
    path = os.path.join(args.out, "embeddings_by_group.png")
    plot_splits(splits, labels, dataset="waterbirds", color_by="group",
                method="pca", out_path=path)
    print("wrote", path)


if __name__ == "__main__":
    main()
