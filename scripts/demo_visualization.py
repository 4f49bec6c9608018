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

    from debiasing_multi_modal_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from debiasing_multi_modal_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

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
        multiple = "old" in variables["params"]  # both converter layouts
        wkey = ("old_cls.adapter.layers.0.weight" if multiple
                else "adapter.layers.0.weight")
        dim = sd[wkey].shape[1]
        hidden = sd[wkey].shape[0]
        kind = "MultipleAdapter" if multiple else "single-adapter"
        print(f"loaded {kind} checkpoint (D={dim}, hidden={hidden})")
        # blended adapted features = what the trained classifier normalizes
        mlp_old = AdapterMLP(hidden_dim=hidden)
        if multiple:
            old_vars = {
                "params": variables["params"]["old"],
                "batch_stats": variables["batch_stats"]["old"],
            }
            new_vars = {
                "params": variables["params"]["new"],
                "batch_stats": variables["batch_stats"]["new"],
            }
        else:
            old_vars = {
                "params": variables["params"]["adapter"],
                "batch_stats": variables["batch_stats"]["adapter"],
            }
            new_vars = None
    else:
        print("reference .pth not found; demo uses an untrained adapter")
        dim, hidden = 64, 16

    meta, table, tc, tg, ts = make_synthetic_dataset(SyntheticSpec(dim=dim, seed=3))

    def norm_rows(m):
        # zero-row guard mirrors viz/analysis.py: a dead ReLU-MLP row would
        # 0/0-NaN the group stats and the joint projection
        return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)

    raw = table.embeddings
    if use_reference:
        old_feats = adapted_embeddings(
            mlp_old, old_vars["params"], old_vars["batch_stats"], raw
        )
        if new_vars is not None:
            new_feats = adapted_embeddings(
                mlp_old, new_vars["params"], new_vars["batch_stats"], raw
            )
            adapted = 0.5 * norm_rows(old_feats) + 0.5 * norm_rows(new_feats)
        else:
            adapted = norm_rows(old_feats)
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
    # zero-shot head over the ADAPTED features (CustomCLIP.forward
    # semantics: normalized image side, un-normalized class columns)
    from debiasing_multi_modal_tpu.train.metrics import results_from_counts

    adapter_preds = np.argmax(adapted_n @ tc, axis=-1)  # tc is [D, C]
    ratio = np.bincount(
        table.group[table.split == 0], minlength=4
    ) / max(1, int((table.split == 0).sum()))
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
        # the table must describe the LOADED adapter, not the synthetic
        # zero-shot predictor (reference VisRepAll reports the evaluated
        # model's own predictions, visualizer.py:200-225)
        preds = adapter_preds[idx]
        labels3[name]["prediction"] = preds
        correct = (preds == table.y[idx]).astype(np.float64)
        corr = np.bincount(table.group[idx], weights=correct, minlength=4)
        cnt = np.bincount(table.group[idx], minlength=4)
        accs = dict(results_from_counts(corr, cnt, 2, ratio))
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
