"""Box-math unit tests with independent numpy oracles.

Oracles implement the formulas documented in
/root/reference/tools/box_utils.py (cited per function in ops/boxes.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops import boxes as B


def _rand_boxes(rng, n, scale=100.0):
    y1x1 = rng.rand(n, 2) * scale
    hw = rng.rand(n, 2) * scale * 0.5 + 1.0
    return np.concatenate([y1x1, y1x1 + hw], axis=1).astype(np.float32)


def _np_iou(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float64)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            y1, x1 = max(a[0], b[0]), max(a[1], b[1])
            y2, x2 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ua = (a[2] - a[0]) * (a[3] - a[1])
            ub = (b[2] - b[0]) * (b[3] - b[1])
            out[i, j] = inter / (ua + ub - inter + 1e-19)
    return out


def test_decode_inverts_encode(rng):
    boxes = _rand_boxes(rng, 64)
    gt = _rand_boxes(rng, 64)
    deltas = B.encode(jnp.array(boxes), jnp.array(gt))
    rec = B.decode(jnp.array(boxes), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_decode_matches_formula(rng):
    boxes = _rand_boxes(rng, 16)
    deltas = (rng.rand(16, 4).astype(np.float32) - 0.5) * 0.4
    got = np.asarray(B.decode(jnp.array(boxes), jnp.array(deltas)))
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    cy = boxes[:, 0] + 0.5 * h + deltas[:, 0] * h
    cx = boxes[:, 1] + 0.5 * w + deltas[:, 1] * w
    nh = h * np.exp(deltas[:, 2])
    nw = w * np.exp(deltas[:, 3])
    want = np.stack([cy - 0.5 * nh, cx - 0.5 * nw,
                     cy - 0.5 * nh + nh, cx - 0.5 * nw + nw], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_decode_batched(rng):
    boxes = _rand_boxes(rng, 6).reshape(2, 3, 4)
    deltas = np.zeros((2, 3, 4), np.float32)
    out = np.asarray(B.decode(jnp.array(boxes), jnp.array(deltas)))
    np.testing.assert_allclose(out, boxes, rtol=1e-6)


def test_iou_matrix_against_oracle(rng):
    b1 = _rand_boxes(rng, 23)
    b2 = _rand_boxes(rng, 11)
    got = np.asarray(B.iou_matrix(jnp.array(b1), jnp.array(b2)))
    want = _np_iou(b1, b2)
    assert got.shape == (23, 11)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_identity(rng):
    b = _rand_boxes(rng, 8)
    diag = np.diag(np.asarray(B.iou_matrix(jnp.array(b), jnp.array(b))))
    np.testing.assert_allclose(diag, 1.0, atol=1e-5)


def test_clip_shared_window(rng):
    b = _rand_boxes(rng, 32, scale=200.0)
    out = np.asarray(B.clip(jnp.array(b), jnp.array([0.0, 0.0, 100.0, 120.0])))
    assert out[:, 0].min() >= 0 and out[:, 2].max() <= 100
    assert out[:, 1].min() >= 0 and out[:, 3].max() <= 120


def test_clip_per_sample_window(rng):
    b = _rand_boxes(rng, 6, scale=200.0).reshape(2, 3, 4)
    win = np.array([[0, 0, 50, 60], [10, 10, 150, 150]], np.float32)
    out = np.asarray(B.clip(jnp.array(b), jnp.array(win)[:, None, :]))
    assert out[0, :, 2].max() <= 50 and out[0, :, 3].max() <= 60
    assert out[1, :, 0].min() >= 10


def test_boxes_from_masks():
    m = np.zeros((2, 16, 16), np.float32)
    m[0, 3:7, 5:11] = 1
    # m[1] stays empty
    out = np.asarray(B.boxes_from_masks(jnp.array(m)))
    np.testing.assert_array_equal(out[0], [3, 5, 7, 11])
    np.testing.assert_array_equal(out[1], [0, 0, 0, 0])


def test_encode_eps_guards_zero_boxes():
    z = jnp.zeros((4, 4))
    out = np.asarray(B.encode(z, z, eps=1e-5))
    assert np.isfinite(out).all()
