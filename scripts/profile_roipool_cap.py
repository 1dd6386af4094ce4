"""Measure the RoIPool window_cap approximation on the intertwiner's
reliable-set (cross-level) pooling — VERDICT r1 "weak" #4.

The big branch pools LARGE RoIs on FINE maps (the small objects' level,
/root/reference/lib/sub_module.py:489-518 semantics), exactly where bin
spans exceed ``window_cap`` and ops/roi_pool.py degrades to an
evenly-strided subsampled max. This quantifies that divergence against an
exact pool (cap >= worst-case span) for the realistic box mix:

  - boxes: the FPN "big set" per meta level l (area >= feat_pool_size^2 on
    level l's scale — the intertwiner's big/small threshold,
    models/intertwiner.py:161), sizes log-uniform up to the full image;
  - features: conv-smooth maps (random maps blurred by a 3x3 avg a few
    times, mimicking post-FPN statistics) AND raw white noise (worst case).

Reports, per (level, cap): fraction of bins whose max differs, mean/max
relative error of the pooled value, and the worst-case bin span observed.
Run on CPU (no TPU needed — pure op semantics).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from feature_intertwiner_tpu.ops.roi_pool import roi_pool  # noqa: E402

IMAGE = 1024
POOL = 14          # feat_pool_size — the reliable-set pooling resolution
N = 256            # boxes per level


def smooth(maps, iters=3):
    c = maps.shape[-1]
    k = jnp.ones((1, 1, 3, 3), maps.dtype) / 9.0      # depthwise OIHW
    k = jnp.tile(k, (c, 1, 1, 1))
    for _ in range(iters):
        maps = jax.lax.conv_general_dilated(
            maps.transpose(0, 3, 1, 2), k,
            (1, 1), "SAME", feature_group_count=c,
        ).transpose(0, 2, 3, 1)
    return maps


def big_boxes(rng, level, n):
    """Pixel boxes from the big set of meta level `level` (stride 2^level):
    side >= POOL * stride (the area threshold), log-uniform up to IMAGE."""
    stride = 2 ** level
    lo = POOL * stride
    side_w = np.exp(rng.uniform(np.log(lo), np.log(IMAGE), n))
    side_h = np.exp(rng.uniform(np.log(lo), np.log(IMAGE), n))
    x1 = rng.uniform(0, IMAGE - side_w)
    y1 = rng.uniform(0, IMAGE - side_h)
    return np.stack([np.zeros(n), x1, y1, x1 + side_w, y1 + side_h], 1)


def main():
    rng = np.random.RandomState(0)
    print(f"image {IMAGE}^2, pooled {POOL}^2, {N} big-set boxes/level")
    hdr = (f"{'lvl':>3} {'feat':>6} {'cap':>4} {'bins!=':>8} "
           f"{'mean rel-err':>12} {'max rel-err':>11} {'max span':>8}")
    print(hdr)
    for level in (2, 3, 4):
        hw = IMAGE // (2 ** level)
        scale = hw / IMAGE
        rois = jnp.asarray(big_boxes(rng, level, N), jnp.float32)
        # worst-case span: full-image box -> hw cells / POOL bins (+1)
        exact_cap = hw // POOL + 2
        for kind in ("smooth", "noise"):
            feats = jnp.asarray(rng.randn(1, hw, hw, 64), jnp.float32)
            if kind == "smooth":
                feats = smooth(feats)
            exact = np.asarray(
                roi_pool(feats, rois, scale, (POOL, POOL),
                         window_cap=exact_cap))
            spans = None
            for cap in (8, 12, 16):
                got = np.asarray(
                    roi_pool(feats, rois, scale, (POOL, POOL),
                             window_cap=cap))
                diff = np.abs(got - exact)
                denom = np.maximum(np.abs(exact), 1e-6)
                frac = float(np.mean(diff > 1e-6))
                rel = diff / denom
                # empirical max span for the sampled boxes
                w_cells = (rois[:, 3] - rois[:, 1]) * scale
                spans = int(np.ceil(float(jnp.max(w_cells)) / POOL)) + 1
                print(f"{level:>3} {kind:>6} {cap:>4} {frac:>8.3%} "
                      f"{float(np.mean(rel)):>12.4f} "
                      f"{float(np.max(rel)):>11.3f} {spans:>8}")


if __name__ == "__main__":
    main()
