"""t-SNE tooling (utils/tsne.py) — the reference's missing tools/tsne.

Checks the perplexity calibration against its definition, the embedding
quality on separable blobs (silhouette), and the plot artifact.
"""

import numpy as np
import pytest

from feature_intertwiner_tpu.utils.tsne import (
    joint_affinities, plot_embedding, tsne_embed)


def _blobs(rng, n_per=20, dim=64, scale=8.0):
    centers = rng.randn(3, dim) * scale
    x = np.concatenate([c + rng.randn(n_per, dim) for c in centers])
    y = np.repeat(np.arange(3), n_per)
    return x.astype(np.float32), y


def test_affinity_rows_match_perplexity():
    rng = np.random.RandomState(0)
    x, _ = _blobs(rng)
    perp = 12.0
    P = joint_affinities(x, perplexity=perp)
    n = x.shape[0]
    assert P.shape == (n, n)
    assert np.all(P > 0)
    np.testing.assert_allclose(P.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    # recover the conditional rows: P_sym = (P_c + P_c^T) / 2n; the row
    # entropies of the *conditional* distribution were calibrated, so check
    # effective perplexity of the symmetrized rows is in a sane band
    row = P[0] / P[0].sum()
    h = -np.sum(row * np.log(np.maximum(row, 1e-30)))
    assert perp / 2 < np.exp(h) < perp * 4


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_embedding_separates_blobs(metric):
    rng = np.random.RandomState(1)
    x, y = _blobs(rng)
    emb = tsne_embed(x, perplexity=10.0, metric=metric, n_iter=200, seed=0)
    assert emb.shape == (x.shape[0], 2)
    assert np.all(np.isfinite(emb))
    from sklearn.metrics import silhouette_score
    assert silhouette_score(emb, y) > 0.3


def test_plot_embedding_writes_png(tmp_path):
    rng = np.random.RandomState(2)
    emb = rng.randn(30, 2).astype(np.float32)
    ids = np.repeat(np.arange(3), 10)
    out = plot_embedding(emb, ids, class_names=["a", "b", "c"],
                         out_path=str(tmp_path / "t.png"), ellipse=True)
    import os
    assert os.path.getsize(out) > 1000
