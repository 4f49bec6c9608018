"""Split-panel embedding scatter plots (reference ``plot_umap_all``,
visualizer.py:411-638): one panel per split, colored by group / class /
spurious / prediction, with group-centroid markers and optional text-prompt
annotations anchored at their nearest image embedding."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from debiasing_multi_modal_tpu.templates import get_prompts
from debiasing_multi_modal_tpu.viz.analysis import nearest_sample, project_2d

_LABEL_KEYS = ("group", "target", "spurious", "prediction")


def _legend_labels(dataset: str):
    p = get_prompts(dataset)
    return {
        "target": dict(enumerate(p.classes)),
        "spurious": dict(enumerate(p.spurious_attributes)),
        "group": dict(enumerate(p.group_attributes)),
        "prediction": {i: f"pred: {c}" for i, c in enumerate(p.classes)},
    }


def plot_splits(
    split_embeddings: Dict[str, np.ndarray],
    split_labels: Dict[str, Dict[str, np.ndarray]],
    dataset: str = "waterbirds",
    color_by: str = "group",
    method: str = "auto",
    text_embeddings: Optional[np.ndarray] = None,  # [C, D] for annotations
    text_names: Optional[Sequence[str]] = None,
    out_path: Optional[str] = None,
    seed: int = 42,
):
    """Render one panel per split; returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(split_embeddings)
    legend = _legend_labels(dataset)[color_by]
    fig, axes = plt.subplots(1, len(names), figsize=(6 * len(names), 5), squeeze=False)

    for ax, name in zip(axes[0], names):
        emb = split_embeddings[name]
        labels = np.asarray(split_labels[name][color_by])
        pts = project_2d(emb, method=method, seed=seed)
        for value, text in legend.items():
            m = labels == value
            if not m.any():
                continue
            ax.scatter(pts[m, 0], pts[m, 1], s=6, alpha=0.5, label=text)
            centroid = pts[m].mean(axis=0)
            ax.scatter(*centroid, s=120, marker="*", edgecolor="black", zorder=5)
        if text_embeddings is not None:
            for c, temb in enumerate(text_embeddings):
                anchor = nearest_sample(emb, temb)
                tname = text_names[c] if text_names else f"text {c}"
                ax.annotate(
                    tname,
                    pts[anchor],
                    fontsize=8,
                    fontweight="bold",
                    bbox=dict(boxstyle="round", fc="white", alpha=0.7),
                )
        ax.set_title(name)
        ax.legend(fontsize=7, loc="best")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
    return fig
