#!/usr/bin/env python
"""Visualization demo (the reference's demo/demo_visualization.ipynb as a
script): load a trained adapter checkpoint — the reference's shipped
MultipleAdapter ``.pth`` when the reference tree is mounted, else a freshly
trained synthetic one — push embeddings through it, and render group-wise
statistics plus 2-D embedding panels before/after adaptation.

    python scripts/demo_visualization.py [--out /tmp/debias_vis]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_PTH = (
    "/root/reference/trained_model/"
    "im_clip_t_clip_class_tl_adapter_reg_seq_alter_t_class_lr_1.0_bs_1024_lrr1.0_bsr_256_MA+rn.pth"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/debias_vis")
    ap.add_argument("--pth", default=REFERENCE_PTH)
    args = ap.parse_args()

    import jax

    from debiasing_multi_modal_tpu.data.synthetic import SyntheticSpec, make_synthetic_dataset
    from debiasing_multi_modal_tpu.models.adapter import AdapterMLP
    from debiasing_multi_modal_tpu.viz.analysis import adapted_embeddings, group_stats
    from debiasing_multi_modal_tpu.viz.plots import plot_splits

    os.makedirs(args.out, exist_ok=True)

    use_reference = os.path.isfile(args.pth)
    if use_reference:
        import torch

        from debiasing_multi_modal_tpu.weights.convert import adapter_variables_from_torch

        sd = {k: v.float().numpy() for k, v in torch.load(args.pth, map_location="cpu").items()}
        variables = adapter_variables_from_torch(sd)
        dim = sd["old_cls.adapter.layers.0.weight"].shape[1]
        hidden = sd["old_cls.adapter.layers.0.weight"].shape[0]
        print(f"loaded reference MultipleAdapter checkpoint (D={dim}, hidden={hidden})")
        # blended adapted features = what the trained classifier normalizes
        mlp_old = AdapterMLP(hidden_dim=hidden)
        old_vars = {
            "params": variables["params"]["old"],
            "batch_stats": variables["batch_stats"]["old"],
        }
        new_vars = {
            "params": variables["params"]["new"],
            "batch_stats": variables["batch_stats"]["new"],
        }
    else:
        print("reference .pth not found; demo uses an untrained adapter")
        dim, hidden = 64, 16

    meta, table, tc, tg, ts = make_synthetic_dataset(SyntheticSpec(dim=dim, seed=3))

    def norm_rows(m):
        return m / np.linalg.norm(m, axis=-1, keepdims=True)

    raw = table.embeddings
    if use_reference:
        old_feats = adapted_embeddings(
            mlp_old, old_vars["params"], old_vars["batch_stats"], raw
        )
        new_feats = adapted_embeddings(
            mlp_old, new_vars["params"], new_vars["batch_stats"], raw
        )
        adapted = 0.5 * norm_rows(old_feats) + 0.5 * norm_rows(new_feats)
    else:
        mlp = AdapterMLP(hidden_dim=hidden)
        import jax.numpy as jnp

        v = mlp.init(jax.random.PRNGKey(0), jnp.asarray(raw[:2]), train=True)
        adapted = adapted_embeddings(mlp, v["params"], v["batch_stats"], raw)

    print("\nGroup-wise embedding statistics (raw -> adapted):")
    stats_raw = group_stats(norm_rows(raw), table.group)
    stats_ad = group_stats(norm_rows(adapted), table.group)
    for g in sorted(stats_raw):
        r, a = stats_raw[g], stats_ad[g]
        print(
            f"  group {g}: n={r['count']:4d}  mean_norm {r['mean_norm']:.3f} -> "
            f"{a['mean_norm']:.3f}   pairwise_dist {r['mean_pairwise_dist']:.3f} -> "
            f"{a['mean_pairwise_dist']:.3f}"
        )

    splits, labels = {}, {}
    for name, emb in (("raw", norm_rows(raw)), ("adapted", norm_rows(adapted))):
        idx = np.where(table.split == 2)[0]  # test split
        splits[name] = emb[idx]
        labels[name] = {
            "group": table.group[idx],
            "target": table.y[idx],
            "spurious": table.place[idx],
            "prediction": table.y_pred[idx],
        }
    path = os.path.join(args.out, "raw_vs_adapted.png")
    plot_splits(splits, labels, dataset="waterbirds", color_by="group",
                method="pca", out_path=path)
    print("wrote", path)

    # ---- reference-style VisRepAll figure (demo/visualizer.py:182-262 +
    # plot_umap_all:411-638): ONE joint umap projection over train/val/test,
    # text-prompt anchors, group-centroid stars, per-split stat tables.
    from debiasing_multi_modal_tpu.templates import get_prompts
    from debiasing_multi_modal_tpu.viz.plots import (
        plot_splits_joint, split_stats_table,
    )

    adapted_n = norm_rows(adapted)
    prompts = get_prompts("waterbirds")
    text_names = [f"a photo of a {c}." for c in prompts.classes]
    embs3, labels3, tables3 = {}, {}, {}
    for name, sid in (("train", 0), ("val", 1), ("test", 2)):
        idx = np.where(table.split == sid)[0]
        embs3[name] = adapted_n[idx]
        labels3[name] = {
            "group": table.group[idx], "target": table.y[idx],
            "spurious": table.place[idx], "prediction": table.y_pred[idx],
        }
        correct = (table.y_pred[idx] == table.y[idx]).astype(np.float64)
        accs = {"mean_acc": float(correct.mean())}
        worst = 1.0
        for g in range(4):
            m = table.group[idx] == g
            a = float(correct[m].mean()) if m.any() else float("nan")
            accs[f"acc_{g // 2}_{g % 2}"] = a
            worst = min(worst, a) if a == a else worst
        accs["worst_acc"] = worst
        tables3[name] = split_stats_table(embs3[name], table.group[idx], accs)

    tag = "adapter_reg_seq_alter" if use_reference else "untrained"
    for dim_out, fname in ((2, "visrepall_2d.png"), (3, "visrepall_3d.png")):
        path = os.path.join(args.out, fname)
        fig, _ = plot_splits_joint(
            embs3, labels3, dataset="waterbirds", color_by="group",
            method="umap", text_embeddings=tc.T, text_names=text_names,
            stats_tables=tables3 if dim_out == 2 else None, out_path=path,
            n_components=dim_out,
            title=f"([{tag}] Representation (10 near.))",
        )
        import matplotlib.pyplot as plt

        plt.close(fig)
        print("wrote", path)


if __name__ == "__main__":
    main()
