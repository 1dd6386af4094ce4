"""Target-assignment tests against the reference's documented rules
(lib/layers.py:439-658 RPN, :224-433 detection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops import boxes as B
from feature_intertwiner_tpu.ops.targets import detection_targets, rpn_targets

STD = np.array([0.1, 0.1, 0.2, 0.2], np.float32)


def _anchors_grid(n=64, size=16.0, span=256.0):
    side = int(np.sqrt(n))
    cs = np.linspace(size, span - size, side)
    out = []
    for cy in cs:
        for cx in cs:
            out.append([cy - size, cx - size, cy + size, cx + size])
    return np.array(out, np.float32)


def test_rpn_targets_basic_rules(rng):
    anchors = _anchors_grid(64)
    gt_boxes = np.zeros((1, 4, 4), np.float32)
    gt_cls = np.zeros((1, 4), np.int32)
    # one GT exactly equal to anchor 10 -> that anchor must be positive
    gt_boxes[0, 0] = anchors[10]
    gt_cls[0, 0] = 3
    t = rpn_targets(jax.random.PRNGKey(0), jnp.array(anchors),
                    jnp.array(gt_cls), jnp.array(gt_boxes), jnp.array(STD))
    match = np.asarray(t.match[0])
    assert match[10] == 1
    # anchors far away with IoU < 0.3 are negative (unless subsampled out):
    # nothing can be positive except overlapping neighbors
    iou = np.asarray(B.iou_matrix(jnp.array(anchors),
                                  jnp.array(gt_boxes[0][:1])))[:, 0]
    assert (match[iou < 0.3] <= 0).all()
    # deltas of the exactly-matching anchor are ~0
    np.testing.assert_allclose(np.asarray(t.deltas[0, 10]), 0.0, atol=1e-5)
    # budget: pos+neg == TRAIN_ANCHORS_PER_IMAGE when enough anchors exist
    n_pos = (match == 1).sum()
    n_neg = (match == -1).sum()
    assert n_pos + n_neg == min(256, 64)


def test_rpn_targets_crowd_exclusion():
    anchors = _anchors_grid(64)
    gt_boxes = np.zeros((1, 2, 4), np.float32)
    gt_cls = np.zeros((1, 2), np.int32)
    gt_boxes[0, 0] = anchors[5]       # crowd covering anchor 5
    gt_cls[0, 0] = -2                 # crowd (negative class)
    gt_boxes[0, 1] = anchors[40]
    gt_cls[0, 1] = 1
    t = rpn_targets(jax.random.PRNGKey(1), jnp.array(anchors),
                    jnp.array(gt_cls), jnp.array(gt_boxes), jnp.array(STD))
    match = np.asarray(t.match[0])
    # the crowd anchor must not be a negative (crowd overlap) nor positive
    assert match[5] == 0
    assert match[40] == 1


def test_rpn_targets_pos_cap(rng):
    # many identical GTs forcing >128 positive anchors -> capped at half
    anchors = _anchors_grid(256, size=20.0, span=256.0)
    g = 60
    gt_boxes = np.tile(anchors[None, :g], (1, 1, 1)).astype(np.float32)
    gt_cls = np.ones((1, g), np.int32)
    t = rpn_targets(jax.random.PRNGKey(2), jnp.array(anchors),
                    jnp.array(gt_cls), jnp.array(gt_boxes), jnp.array(STD))
    match = np.asarray(t.match[0])
    assert (match == 1).sum() <= 128


def _dt_setup(rng, p=32, g=3):
    props = np.zeros((1, p, 4), np.float32)
    y1x1 = rng.uniform(0, 0.5, (p, 2))
    props[0] = np.concatenate([y1x1, y1x1 + rng.uniform(0.1, 0.4, (p, 2))], 1)
    gt_boxes = np.zeros((1, 8, 4), np.float32)
    gt_cls = np.zeros((1, 8), np.int32)
    gt_boxes[0, :g] = props[0, :g]    # first g proposals match GTs exactly
    gt_cls[0, :g] = rng.randint(1, 5, g)
    masks = (rng.rand(1, 8, 14, 14) > 0.4).astype(np.float32)
    return props, gt_cls, gt_boxes, masks


def test_detection_targets_sampling_and_deltas(rng):
    props, gt_cls, gt_boxes, masks = _dt_setup(rng)
    t = detection_targets(
        jax.random.PRNGKey(0), jnp.array(props), jnp.array(gt_cls),
        jnp.array(gt_boxes), jnp.array(masks), jnp.array(STD),
        rois_per_image=20, positive_ratio=0.33)
    pos = np.asarray(t.pos_mask[0])
    valid = np.asarray(t.valid_mask[0])
    cls = np.asarray(t.class_ids[0])
    # positives live in the front slots, carry their GT class
    assert pos[:int(20 * 0.33)].sum() == pos.sum() > 0
    assert (cls[pos] > 0).all()
    assert (cls[~pos] == 0).all()
    # negative count follows int(pos*(1/ratio - 1))
    n_pos = int(pos.sum())
    want_neg = int(np.floor((1 / 0.33) * n_pos - n_pos))
    n_neg = int((valid & ~pos).sum())
    assert n_neg <= want_neg  # capped by availability/capacity
    # exact-match positives have ~zero deltas
    d = np.asarray(t.deltas[0])
    rois = np.asarray(t.rois[0])
    for i in np.where(pos)[0]:
        for j in range(3):
            if np.allclose(rois[i], gt_boxes[0, j], atol=1e-6):
                np.testing.assert_allclose(d[i], 0.0, atol=1e-4)


def test_detection_targets_mask_crop_identity(rng):
    # a positive RoI equal to its GT box with mini-masks: the mask target is
    # the (resized) mini mask itself
    props = np.zeros((1, 4, 4), np.float32)
    props[0, 0] = [0.2, 0.2, 0.6, 0.7]
    gt_boxes = np.zeros((1, 2, 4), np.float32)
    gt_boxes[0, 0] = props[0, 0]
    gt_cls = np.zeros((1, 2), np.int32)
    gt_cls[0, 0] = 1
    masks = np.zeros((1, 2, 28, 28), np.float32)
    masks[0, 0, 7:21, 7:21] = 1.0
    t = detection_targets(
        jax.random.PRNGKey(3), jnp.array(props), jnp.array(gt_cls),
        jnp.array(gt_boxes), jnp.array(masks), jnp.array(STD),
        rois_per_image=8, positive_ratio=0.33, mask_shape=(28, 28))
    pos = np.asarray(t.pos_mask[0])
    assert pos.sum() == 1
    got = np.asarray(t.masks[0][np.where(pos)[0][0]])
    np.testing.assert_allclose(got, masks[0, 0], atol=1e-5)


def test_detection_targets_no_positives(rng):
    # proposals that miss every GT -> no positives, no NaNs
    props = np.tile(np.array([[[0.8, 0.8, 0.95, 0.95]]], np.float32),
                    (1, 6, 1))
    gt_boxes = np.zeros((1, 2, 4), np.float32)
    gt_boxes[0, 0] = [0.0, 0.0, 0.2, 0.2]
    gt_cls = np.zeros((1, 2), np.int32)
    gt_cls[0, 0] = 1
    masks = np.zeros((1, 2, 14, 14), np.float32)
    t = detection_targets(
        jax.random.PRNGKey(4), jnp.array(props), jnp.array(gt_cls),
        jnp.array(gt_boxes), jnp.array(masks), jnp.array(STD),
        rois_per_image=8, positive_ratio=0.33, mask_shape=(14, 14))
    assert np.asarray(t.pos_mask).sum() == 0
    assert np.isfinite(np.asarray(t.deltas)).all()
