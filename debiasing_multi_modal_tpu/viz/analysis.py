"""Embedding-space analysis (reference ``demo/visualizer.py`` C15).

- ``adapted_embeddings``: run cached CLIP embeddings through a trained
  adapter classifier (the VisHandler "extract activations" path,
  visualizer.py:100-134) — batched and jitted, no Python loop.
- ``group_stats``: per-group mean vector, mean-vector norm, and mean pairwise
  distance (``GetGroupWiseStatEbd``, visualizer.py:657-690).
- ``project_2d``: 2-D projection for plotting — UMAP when ``umap-learn`` is
  installed (the reference default, seeded), else sklearn MDS (the
  reference's ``plot_mds`` alternative) or PCA.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def adapted_embeddings(
    module,
    params,
    batch_stats,
    embeddings: np.ndarray,
    batch_size: int = 1024,
) -> np.ndarray:
    """Adapter-transformed features (eval mode, running BN stats)."""
    import jax
    import jax.numpy as jnp

    apply = jax.jit(
        lambda x: module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
    )
    out = []
    for start in range(0, len(embeddings), batch_size):
        out.append(np.asarray(apply(jnp.asarray(embeddings[start : start + batch_size]))))
    return np.concatenate(out, axis=0)


def group_stats(embeddings: np.ndarray, groups: np.ndarray, n_groups: int = 4,
                max_pairwise: int = 512, seed: int = 0) -> Dict[int, Dict[str, float]]:
    """Per-group {mean_norm, mean_pairwise_dist, count} (visualizer.py:657-690).

    Pairwise distance is subsampled for large groups (the reference computes
    the full quadratic matrix; statistically identical)."""
    rng = np.random.default_rng(seed)
    stats: Dict[int, Dict[str, float]] = {}
    for g in range(n_groups):
        idx = np.where(groups == g)[0]
        if len(idx) == 0:
            stats[g] = {"count": 0, "mean_norm": float("nan"), "mean_pairwise_dist": float("nan")}
            continue
        sub = embeddings[idx]
        mean_vec = sub.mean(axis=0)
        if len(idx) > max_pairwise:
            sub = sub[rng.choice(len(idx), max_pairwise, replace=False)]
        diffs = sub[:, None, :] - sub[None, :, :]
        d = np.sqrt((diffs ** 2).sum(-1))
        n = len(sub)
        mean_pd = d[np.triu_indices(n, 1)].mean() if n > 1 else 0.0
        stats[g] = {
            "count": int(len(idx)),
            "mean_norm": float(np.linalg.norm(mean_vec)),
            "mean_pairwise_dist": float(mean_pd),
        }
    return stats


def project_2d(
    embeddings: np.ndarray,
    method: str = "auto",
    seed: int = 42,
    n_neighbors: int = 15,
) -> np.ndarray:
    """[N, D] -> [N, 2] for plotting."""
    if method == "auto":
        try:
            import umap  # noqa: F401

            method = "umap"
        except ImportError:
            method = "pca"
    if method == "umap":
        import umap

        return umap.UMAP(
            n_components=2, random_state=seed, n_neighbors=n_neighbors
        ).fit_transform(embeddings)
    if method == "mds":
        from sklearn.manifold import MDS

        return MDS(n_components=2, random_state=seed, normalized_stress="auto").fit_transform(
            embeddings
        )
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=seed).fit_transform(embeddings)
    raise ValueError(f"unknown projection method {method!r}")


def nearest_sample(embeddings: np.ndarray, query: np.ndarray) -> int:
    """Index of the embedding closest to ``query`` (the reference anchors
    text prompts in image space via the nearest image, visualizer.py:19-27)."""
    d = np.linalg.norm(embeddings - query[None, :], axis=1)
    return int(np.argmin(d))
