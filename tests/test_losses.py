"""Loss-function tests against naive numpy oracles with the reference's
reduction semantics (lib/layers.py:808-934)."""

import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.train import losses as L


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_smooth_l1():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(L.smooth_l1(x))
    np.testing.assert_allclose(got, [1.5, 0.125, 0.0, 0.125, 1.5])


def test_rpn_class_loss_oracle(rng):
    b, a = 2, 50
    match = rng.choice([-1, 0, 1], (b, a), p=[0.3, 0.5, 0.2])
    logits = rng.randn(b, a, 2).astype(np.float32)
    got = float(L.rpn_class_loss(jnp.array(match), jnp.array(logits)))
    # oracle: CE over non-neutral anchors, target = (match==1)
    sel = match != 0
    p = _softmax(logits[sel])
    t = (match[sel] == 1).astype(int)
    want = -np.mean(np.log(p[np.arange(len(t)), t]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rpn_bbox_loss_oracle(rng):
    b, a = 2, 40
    match = rng.choice([-1, 0, 1], (b, a), p=[0.3, 0.4, 0.3])
    target = rng.randn(b, a, 4).astype(np.float32)
    pred = rng.randn(b, a, 4).astype(np.float32)
    got = float(L.rpn_bbox_loss(jnp.array(target), jnp.array(match),
                                jnp.array(pred)))
    pos = match == 1
    diff = pred[pos] - target[pos]
    sl1 = np.where(np.abs(diff) < 1, 0.5 * diff ** 2, np.abs(diff) - 0.5)
    want = sl1.mean()  # mean over positives x 4 (packed-buffer parity)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mrcnn_class_loss_includes_padding_slots(rng):
    b, r, k = 2, 10, 5
    target = rng.randint(0, k, (b, r))
    target[1, :] = 0
    logits = rng.randn(b, r, k).astype(np.float32)
    got = float(L.mrcnn_class_loss(jnp.array(target), jnp.array(logits)))
    p = _softmax(logits.reshape(-1, k))
    want = -np.mean(np.log(p[np.arange(b * r), target.reshape(-1)]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # all-zero targets -> zero loss (reference zero branch)
    assert float(L.mrcnn_class_loss(jnp.zeros((b, r), jnp.int32),
                                    jnp.array(logits))) == 0.0


def test_mrcnn_bbox_loss_class_slice(rng):
    b, r, k = 1, 6, 4
    target_cls = np.array([[0, 2, 0, 3, 1, 0]])
    target = rng.randn(b, r, 4).astype(np.float32)
    pred = rng.randn(b, r, k, 4).astype(np.float32)
    got = float(L.mrcnn_bbox_loss(jnp.array(target), jnp.array(target_cls),
                                  jnp.array(pred)))
    rows = [(0, 1, 2), (0, 3, 3), (0, 4, 1)]
    diffs = np.concatenate(
        [pred[bb, rr, cc] - target[bb, rr] for bb, rr, cc in rows])
    sl1 = np.where(np.abs(diffs) < 1, 0.5 * diffs ** 2, np.abs(diffs) - 0.5)
    np.testing.assert_allclose(got, sl1.mean(), rtol=1e-5)


def test_mrcnn_mask_loss_class_slice(rng):
    b, r, k, m = 1, 4, 3, 8
    target_cls = np.array([[0, 1, 2, 0]])
    target = (rng.rand(b, r, m, m) > 0.5).astype(np.float32)
    pred = rng.rand(b, r, m, m, k).astype(np.float32) * 0.98 + 0.01
    got = float(L.mrcnn_mask_loss(jnp.array(target), jnp.array(target_cls),
                                  jnp.array(pred)))
    sel = []
    for rr, cc in ((1, 1), (2, 2)):
        p = pred[0, rr, :, :, cc]
        t = target[0, rr]
        sel.append(-(t * np.log(p) + (1 - t) * np.log(1 - p)))
    want = np.concatenate(sel).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)
