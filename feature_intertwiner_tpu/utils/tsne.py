"""t-SNE feature-space visualization of detection features.

The reference configures a t-SNE feature pipeline (``TSNE.*``,
/root/reference/lib/config.py:250-260) whose tooling (``tools/tsne/``) is
absent from its repo (SURVEY.md §2.1); this module supplies the capability:
embed the 1024-d per-detection features dumped by the visualize phase
(``features.npz`` — lib/workflow.py:449-451's ``features.pth`` equivalent)
and plot per-class clusters, optionally with confidence ellipses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def embed_features(features: np.ndarray, perplexity: float = 30,
                   metric: str = "euclidean", n_components: int = 2,
                   seed: int = 0) -> np.ndarray:
    """[N, D] -> [N, n_components] t-SNE embedding (sklearn backend)."""
    from sklearn.manifold import TSNE

    n = len(features)
    if n <= 1:
        # sklearn requires perplexity < n_samples; 0-1 detections can't embed
        return np.zeros((n, n_components))
    perplexity = min(perplexity, max(1.0, (n - 1) / 3))
    ts = TSNE(n_components=n_components, perplexity=perplexity,
              metric=metric, random_state=seed, init="pca")
    return ts.fit_transform(np.asarray(features, np.float64))


def plot_embedding(emb: np.ndarray, class_ids: np.ndarray,
                   class_names=None, save_path: Optional[str] = None,
                   ellipse: bool = True, title: str = "t-SNE of detection features"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    fig, ax = plt.subplots(figsize=(10, 10))
    classes = np.unique(class_ids)
    cmap = plt.get_cmap("tab20")
    for i, c in enumerate(classes):
        pts = emb[class_ids == c]
        color = cmap(i % 20)
        label = (class_names[int(c)] if class_names is not None
                 and int(c) < len(class_names) else str(int(c)))
        ax.scatter(pts[:, 0], pts[:, 1], s=8, color=color, label=label,
                   alpha=0.7)
        if ellipse and len(pts) >= 3:
            mean = pts.mean(0)
            cov = np.cov(pts.T)
            vals, vecs = np.linalg.eigh(cov)
            angle = np.degrees(np.arctan2(vecs[1, -1], vecs[0, -1]))
            wdt, hgt = 2 * 2 * np.sqrt(np.maximum(vals, 1e-12))
            ax.add_patch(Ellipse(mean, wdt, hgt, angle=angle, fill=False,
                                 color=color, alpha=0.5))
    ax.set_title(title)
    ax.legend(fontsize=7, ncol=2, loc="best")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return save_path
    return fig


def run_from_features_file(features_path: str, cfg, save_dir: Optional[str] = None):
    """Load features.npz (visualize phase) and produce the t-SNE figure."""
    data = np.load(features_path)
    feats = data["features"].reshape(-1, data["features"].shape[-1])
    dets = data["detections"].reshape(-1, data["detections"].shape[-1])
    valid = dets[:, 5] > 0
    feats, cls = feats[valid], dets[valid, 4].astype(np.int32)
    if cfg.TSNE.A_FEW:
        feats, cls = feats[:512], cls[:512]
    emb = embed_features(feats, perplexity=cfg.TSNE.PERPLEXITY,
                         metric=cfg.TSNE.METRIC,
                         n_components=cfg.TSNE.N_TOPICS)
    save_dir = save_dir or os.path.dirname(features_path)
    out = os.path.join(save_dir, f"tsne_{cfg.TSNE.FIG_FOLDER_SUX}.png")
    return plot_embedding(emb, cls, save_path=out,
                          ellipse=cfg.TSNE.ELLIPSE)
