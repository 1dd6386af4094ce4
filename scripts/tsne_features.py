#!/usr/bin/env python
"""t-SNE of visualize-phase detection features (the reference's missing
``tools/tsne`` tooling; config namespace ``/root/reference/lib/config.py:250-260``).

Consumes the ``features.npz`` written by ``python main.py --phase visualize``
(features [N,M,1024], detections [N,M,6] = y1,x1,y2,x2,class_id,score) and
writes a class-colored scatter PNG next to it.

Usage:
  python scripts/tsne_features.py results/<name>/visualize/features.npz
      [--perplexity 30] [--metric euclidean|cosine] [--n-iter 150]
      [--max-samples 1024] [--no-ellipse] [--out tsne.png]

Defaults mirror the reference's TSNE config (PERPLEXITY=30,
METRIC='euclidean', N_TOPICS=2, BATCH_SZ=1024, TOTAL_EP=150, ELLIPSE=True).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", help="features.npz from --phase visualize")
    ap.add_argument("--perplexity", type=float, default=30.0)
    ap.add_argument("--metric", default="euclidean",
                    choices=["euclidean", "cosine"])
    ap.add_argument("--n-iter", type=int, default=150)
    ap.add_argument("--max-samples", type=int, default=1024,
                    help="cap on detections embedded (TSNE.BATCH_SZ)")
    ap.add_argument("--no-ellipse", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # post-hoc analysis tool: run on CPU so it never contends with a
    # training/eval process holding the TPU chip (tiny N — CPU is plenty)
    import jax
    jax.config.update("jax_platforms", "cpu")

    data = np.load(args.npz)
    feats = data["features"].reshape(-1, data["features"].shape[-1])
    dets = data["detections"].reshape(-1, data["detections"].shape[-1])
    valid = dets[:, 5] > 0  # zero-score rows are padding
    feats, class_ids = feats[valid], dets[valid, 4].astype(np.int64)
    if feats.shape[0] == 0:
        sys.exit("no valid detections in " + args.npz)
    if feats.shape[0] > args.max_samples:
        sel = np.random.RandomState(args.seed).choice(
            feats.shape[0], args.max_samples, replace=False)
        feats, class_ids = feats[sel], class_ids[sel]

    from feature_intertwiner_tpu.config import CLASS_NAMES
    from feature_intertwiner_tpu.utils.tsne import plot_embedding, tsne_embed

    emb = tsne_embed(feats, perplexity=args.perplexity, metric=args.metric,
                     n_iter=args.n_iter, seed=args.seed)
    names = CLASS_NAMES if class_ids.max() < len(CLASS_NAMES) else None
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(args.npz)),
                                   "tsne.png")
    plot_embedding(emb, class_ids, class_names=names, out_path=out,
                   ellipse=not args.no_ellipse,
                   title=f"t-SNE ({feats.shape[0]} detections, "
                         f"perplexity {args.perplexity:g})")
    print("wrote", out)


if __name__ == "__main__":
    main()
