"""RoIPool parity vs a numpy oracle of the CUDA kernel semantics
(roi_pooling_kernel.cu:24-93)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.roi_pool import make_roi_pool_input, roi_pool


def np_roi_pool(features, rois, scale, pooled):
    b, h, w, c = features.shape
    n = len(rois)
    out = np.zeros((n, pooled, pooled, c), np.float32)
    for k in range(n):
        bi = int(rois[k, 0])
        sw = int(round(rois[k, 1] * scale))
        sh = int(round(rois[k, 2] * scale))
        ew = int(round(rois[k, 3] * scale))
        eh = int(round(rois[k, 4] * scale))
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        # exact rational bin edges (matches ops/roi_pool.py integer math)
        for ph in range(pooled):
            for pw in range(pooled):
                hs = min(max(ph * rh // pooled + sh, 0), h)
                he = min(max(-((-(ph + 1) * rh) // pooled) + sh, 0), h)
                ws = min(max(pw * rw // pooled + sw, 0), w)
                we = min(max(-((-(pw + 1) * rw) // pooled) + sw, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[k, ph, pw] = features[bi, hs:he, ws:we].max(axis=(0, 1))
    return out


@pytest.mark.parametrize("pooled,scale,cap", [(7, 0.25, 16), (2, 0.5, 32)])
def test_roi_pool_matches_oracle(rng, pooled, scale, cap):
    b, h, w, c = 2, 32, 32, 4
    features = rng.randn(b, h, w, c).astype(np.float32)
    n = 12
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    rois = np.stack([
        rng.randint(0, b, n).astype(np.float32),
        x1, y1,
        x1 + rng.uniform(4, 100, n),
        y1 + rng.uniform(4, 100, n),
    ], 1).astype(np.float32)
    got = np.asarray(roi_pool(jnp.array(features), jnp.array(rois),
                              scale, (pooled, pooled), window_cap=cap))
    want = np_roi_pool(features, rois, scale, pooled)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_roi_pool_malformed_roi_forced_1x1(rng):
    features = rng.randn(1, 16, 16, 2).astype(np.float32)
    rois = np.array([[0, 40, 40, 20, 20]], np.float32)  # x2<x1, y2<y1
    got = np.asarray(roi_pool(jnp.array(features), jnp.array(rois), 0.25, (3, 3)))
    want = np_roi_pool(features, rois, 0.25, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_make_roi_pool_input():
    boxes = jnp.array([[0.1, 0.2, 0.5, 0.6]])
    out = np.asarray(make_roi_pool_input(boxes, jnp.array([3]), 1024.0))
    np.testing.assert_allclose(out, [[3, 204.8, 102.4, 614.4, 512.0]], rtol=1e-6)


def test_oversized_bins_cover_full_window():
    """Bins wider than window_cap use evenly-strided sampling that always
    reaches the window END — the old prefix-truncated sampling returned the
    max of only the first `cap` cells."""
    import jax.numpy as jnp
    from feature_intertwiner_tpu.ops.roi_pool import roi_pool

    h = w = 64
    feat = np.zeros((1, h, w, 1), np.float32)
    feat[0, h - 1, w - 1, 0] = 100.0  # max in the very last cell
    # one RoI covering the whole map, pooled 1x1: bin spans 64 > cap 8
    rois = jnp.array([[0, 0, 0, w - 1, h - 1]], jnp.float32)
    out = np.asarray(roi_pool(jnp.array(feat), rois, 1.0, (1, 1),
                              window_cap=8))
    assert out[0, 0, 0, 0] == 100.0

    # exactness still holds for spans <= cap: random map, RoI of 8x8 cells
    rng = np.random.RandomState(0)
    feat2 = rng.randn(1, h, w, 3).astype(np.float32)
    rois2 = jnp.array([[0, 10, 20, 17, 27]], jnp.float32)  # 8x8 cells
    out2 = np.asarray(roi_pool(jnp.array(feat2), rois2, 1.0, (2, 2),
                               window_cap=8))
    win = feat2[0, 20:28, 10:18]
    expect = np.stack([
        [win[0:4, 0:4].max(0).max(0), win[0:4, 4:8].max(0).max(0)],
        [win[4:8, 0:4].max(0).max(0), win[4:8, 4:8].max(0).max(0)],
    ])
    np.testing.assert_allclose(out2[0], expect, atol=1e-6)


def test_exact_per_level_cap_formula(rng):
    """ROIS.WINDOW_CAP=0 uses cap = cells//pooled + 2 per level
    (models/intertwiner.py::Dev._pool_cap). Verify that bound is exact for
    the worst case it must cover: a full-map RoI (widest possible bins)."""
    h = w = 64
    pooled = 14
    cap = h // pooled + 2
    feat = rng.randn(1, h, w, 3).astype(np.float32)
    rois = np.array([[0, 0, 0, w - 1, h - 1]], np.float32)
    got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois), 1.0,
                              (pooled, pooled), window_cap=cap))
    want = np_roi_pool(feat, rois, 1.0, pooled)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_window_cap_config_plumbing():
    """ROIS.WINDOW_CAP reaches Dev.window_cap through InterNet.from_config."""
    import jax.numpy as jnp_
    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet

    cfg = build_config()
    cfg.ROIS.METHOD = "roi_pool"
    cfg.ROIS.WINDOW_CAP = 0
    cfg.finalize()
    model = InterNet.from_config(cfg, dtype=jnp_.float32)
    assert model.roi_pool_window_cap == 0
