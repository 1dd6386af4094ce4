"""t-SNE embedding of visualize-phase detection features.

The reference ships a ``TSNE`` config namespace
(``/root/reference/lib/config.py:250-260`` — perplexity, metric, output
dims, epochs, ellipse rendering) and a ``--phase visualize`` path that dumps
per-detection 1024-d classifier features for "t-SNE tooling"
(``/root/reference/lib/workflow.py:449-451``), but the tooling itself
(``tools/tsne/``) is absent from the reference repo. This module supplies it
TPU-natively: affinities are computed once on the host (perplexity binary
search, SNE convention of van der Maaten & Hinton 2008), and the gradient
descent — the hot loop — is a single jitted ``lax.fori_loop`` of dense
[N,N] matmul-shaped updates that XLA maps onto the MXU.

Standard t-SNE recipe: symmetrized conditional affinities, early
exaggeration (×12 for the first quarter of the epochs), momentum 0.5→0.8,
student-t low-dimensional kernel.
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(x: np.ndarray, metric: str = "euclidean") -> np.ndarray:
    """Squared distances [N,N]; 'cosine' embeds rows on the unit sphere."""
    if metric == "cosine":
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sq = np.sum(x * x, axis=1)
    d = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def _conditional_p(dists_row: np.ndarray, beta: float) -> np.ndarray:
    p = np.exp(-dists_row * beta)
    s = p.sum()
    return p / s if s > 0 else p


def joint_affinities(features: np.ndarray, perplexity: float = 30.0,
                     metric: str = "euclidean", tol: float = 1e-5,
                     max_iter: int = 50) -> np.ndarray:
    """Symmetrized joint P [N,N] with per-row beta matched to perplexity."""
    n = features.shape[0]
    d = _pairwise_sq_dists(features.astype(np.float64), metric)
    # a row's entropy is at most log(n-1): an infeasible perplexity would
    # drive every beta to 0 (uniform affinities, structureless embedding) —
    # clamp like sklearn's effective perplexity does for small N
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    target = np.log(perplexity)
    P = np.zeros((n, n), np.float64)
    for i in range(n):
        row = np.delete(d[i], i)
        beta, lo, hi = 1.0, 0.0, np.inf
        for _ in range(max_iter):
            p = _conditional_p(row, beta)
            h = -np.sum(p * np.log(np.maximum(p, 1e-30)))  # entropy
            if abs(h - target) < tol:
                break
            if h > target:  # too flat -> sharpen
                lo, beta = beta, beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi, beta = beta, beta / 2 if lo == 0.0 else (beta + lo) / 2
        P[i, np.arange(n) != i] = _conditional_p(row, beta)
    P = (P + P.T) / (2.0 * n)
    return np.maximum(P, 1e-12)


def tsne_embed(features: np.ndarray, perplexity: float = 30.0,
               metric: str = "euclidean", n_components: int = 2,
               n_iter: int = 150, learning_rate: float | None = None,
               seed: int = 0) -> np.ndarray:
    """Embed [N,D] features to [N,n_components] via jitted gradient descent."""
    import jax
    import jax.numpy as jnp

    n = features.shape[0]
    if n <= 1:  # student-t kernel has no off-diagonal mass to normalize
        return np.zeros((n, n_components), np.float32)
    P = jnp.asarray(joint_affinities(features, perplexity, metric),
                    jnp.float32)
    lr = float(learning_rate) if learning_rate else max(n / 12.0, 50.0)
    exaggeration_end = max(n_iter // 4, 1)
    rng = np.random.RandomState(seed)
    y0 = jnp.asarray(rng.randn(n, n_components).astype(np.float32) * 1e-2)

    def step(i, carry):
        y, vel, gains = carry
        sq = jnp.sum(y * y, axis=1)
        num = 1.0 / (1.0 + sq[:, None] + sq[None, :] - 2.0 * (y @ y.T))
        num = num * (1.0 - jnp.eye(n))
        Q = jnp.maximum(num / jnp.sum(num), 1e-12)
        Pe = jnp.where(i < exaggeration_end, P * 12.0, P)
        W = (Pe - Q) * num                                    # [N,N]
        grad = 4.0 * ((jnp.diag(jnp.sum(W, axis=1)) - W) @ y)  # [N,C]
        momentum = jnp.where(i < exaggeration_end, 0.5, 0.8)
        gains = jnp.where(jnp.sign(grad) != jnp.sign(vel),
                          gains + 0.2, gains * 0.8)
        gains = jnp.maximum(gains, 0.01)
        vel = momentum * vel - lr * gains * grad
        y = y + vel
        return y - jnp.mean(y, axis=0), vel, gains

    init = (y0, jnp.zeros_like(y0), jnp.ones_like(y0))
    y, _, _ = jax.jit(
        lambda c: jax.lax.fori_loop(0, n_iter, step, c))(init)
    return np.asarray(y)


def plot_embedding(emb: np.ndarray, class_ids: np.ndarray,
                   class_names=None, out_path: str = "tsne.png",
                   ellipse: bool = True, title: str = "t-SNE of features"):
    """Scatter colored by class, optional 1-sigma covariance ellipses."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    fig, ax = plt.subplots(figsize=(9, 9))
    classes = np.unique(class_ids)
    cmap = plt.get_cmap("tab20")
    for k, c in enumerate(classes):
        sel = class_ids == c
        color = cmap(k % 20)
        label = (class_names[int(c)] if class_names is not None
                 and int(c) < len(class_names) else str(int(c)))
        ax.scatter(emb[sel, 0], emb[sel, 1], s=9, color=color, label=label,
                   alpha=0.7, linewidths=0)
        if ellipse and sel.sum() >= 3:
            pts = emb[sel]
            mu, cov = pts.mean(0), np.cov(pts.T)
            vals, vecs = np.linalg.eigh(cov)
            ang = np.degrees(np.arctan2(vecs[1, -1], vecs[0, -1]))
            w, h = 2 * np.sqrt(np.maximum(vals, 0))
            ax.add_patch(Ellipse(mu, w, h, angle=ang, facecolor="none",
                                 edgecolor=color, lw=1.2, alpha=0.9))
    ax.legend(loc="best", fontsize=7, ncol=2, markerscale=2)
    ax.set_title(title)
    ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path
