"""Training target assignment, fully vectorized (vmap over batch).

The reference computes these inside ``forward`` with per-sample Python loops
on GPU (``prepare_rpn_target`` /root/reference/lib/layers.py:439-658,
``prepare_det_target`` :224-433 — SURVEY.md hot loop #3). Here both are pure
batched functions with static shapes and explicit PRNG keys (the reference
uses the global numpy/torch RNG for its pos/neg subsampling; seeds are
plumbed for reproducibility — SURVEY.md §7 "Host/device split").

Semantics preserved:
- crowd GT boxes (negative class ids) are excluded from matching, and anchors
  or proposals overlapping a crowd by IoU ≥ 0.001 can't become negatives;
- RPN: neg < NEG_THRES, force-match the best anchor per GT, pos ≥ POS_THRES,
  subsample to TRAIN_ANCHORS_PER_IMAGE with ≤ half positive, deltas
  ÷ BBOX_STD_DEV;
- DET: pos ≥ 0.5 IoU, sample ``R·ratio`` positives and ``int(pos·(1/ratio−1))``
  negatives, per-class deltas ÷ STD, mask targets by crop_and_resize of the
  (mini)mask into the RoI frame at MASK_SHAPE then rounded (layers.py:296-323);
- zero padding everywhere (padded rows are class 0 — they train as background,
  exactly like the reference's dense packing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops
from .roi_align import crop_and_resize_separable


def _random_topk_mask(key, eligible: jax.Array, k: int,
                      budget=None) -> Tuple[jax.Array, jax.Array]:
    """Pick up to ``k`` random elements of ``eligible`` (bool [N]).

    The k highest of N iid uniform scores are a uniform random k-subset, and
    ``top_k`` (k ≤ a few hundred) over large N is far cheaper than a full
    argsort+rank formulation (scripts/profile_targets2.py). ``budget``
    (traced scalar, ≤ k) further caps the number selected.

    Returns (idx [k] int32, valid [k] bool). Deterministic given key.
    """
    scores = jnp.where(eligible, jax.random.uniform(key, eligible.shape), -1.0)
    k_eff = min(k, eligible.shape[0])
    _, idx = jax.lax.top_k(scores, k_eff)
    if k_eff < k:  # fewer candidates than the static budget: pad
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
    count = jnp.minimum(jnp.sum(eligible.astype(jnp.int32)), k_eff)
    if budget is not None:
        count = jnp.minimum(count, budget)
    valid = jnp.arange(k) < count
    return idx.astype(jnp.int32), valid


def _random_keep_mask(key, eligible: jax.Array, k: int, budget=None) -> jax.Array:
    """Dense [N] bool variant of :func:`_random_topk_mask`.

    max-scatter, not set: when k > N the idx vector is padded with zeros
    whose valid=False entries must not clobber a selected element 0."""
    idx, valid = _random_topk_mask(key, eligible, k, budget)
    return jnp.zeros(eligible.shape, bool).at[idx].max(valid)


class RPNTargets(NamedTuple):
    match: jax.Array        # [B, A] int32: 1 pos, -1 neg, 0 neutral
    deltas: jax.Array       # [B, A, 4] per-anchor target deltas (pos rows valid)


@functools.partial(jax.jit, static_argnames=("train_anchors_per_image",
                                             "pos_thresh", "neg_thresh"))
def rpn_targets(
    key: jax.Array,
    anchors: jax.Array,
    gt_class_ids: jax.Array,
    gt_boxes: jax.Array,
    bbox_std_dev: jax.Array,
    train_anchors_per_image: int = 256,
    pos_thresh: float = 0.7,
    neg_thresh: float = 0.3,
) -> RPNTargets:
    """anchors [A,4] pixels; gt_class_ids [B,G] (0 = pad, <0 = crowd);
    gt_boxes [B,G,4] pixels. Returns dense per-anchor targets.

    The reference packs positive deltas into a [256, 4] buffer
    (layers.py:595-604); the dense per-anchor form here pairs identically
    under the masked loss (train/losses.py)."""
    half = train_anchors_per_image // 2

    def per_sample(k1, cls_ids, boxes):
        valid_gt = cls_ids > 0
        crowd = cls_ids < 0

        iou = box_ops.iou_matrix(anchors, boxes)            # [A, G]
        iou_valid = jnp.where(valid_gt[None, :], iou, -1.0)
        anchor_iou_max = jnp.max(iou_valid, axis=1)
        anchor_iou_argmax = jnp.argmax(iou_valid, axis=1)

        crowd_iou = jnp.where(crowd[None, :], iou, -1.0)
        no_crowd = jnp.max(crowd_iou, axis=1) < 0.001

        match = jnp.zeros(anchors.shape[0], jnp.int32)
        match = jnp.where((anchor_iou_max < neg_thresh) & no_crowd, -1, match)

        # force-match: best anchor for each (valid) GT
        gt_best_anchor = jnp.argmax(jnp.where(valid_gt[None, :], iou, -1.0), axis=0)
        force = jnp.zeros(match.shape, jnp.int32).at[gt_best_anchor].add(
            valid_gt.astype(jnp.int32), mode="drop") > 0
        match = jnp.where(force, 1, match)
        match = jnp.where(anchor_iou_max >= pos_thresh, 1, match)

        # subsample positives to <= half (random k-subset via top_k)
        k_pos, k_neg = jax.random.split(k1)
        pos = match == 1
        keep_pos = _random_keep_mask(k_pos, pos, half)
        match = jnp.where(pos & ~keep_pos, 0, match)

        # subsample negatives to fill the budget
        n_pos_kept = jnp.sum((match == 1).astype(jnp.int32))
        budget = train_anchors_per_image - n_pos_kept
        neg = match == -1
        keep_neg = _random_keep_mask(
            k_neg, neg, train_anchors_per_image, budget)
        match = jnp.where(neg & ~keep_neg, 0, match)

        # per-anchor deltas toward the argmax GT (valid for positives)
        matched_gt = boxes[anchor_iou_argmax]
        deltas = box_ops.encode(anchors, matched_gt, eps=1e-8)
        deltas = deltas / jnp.asarray(bbox_std_dev, deltas.dtype)
        deltas = jnp.where((match == 1)[:, None], deltas, 0.0)
        return match, deltas

    keys = jax.random.split(key, gt_class_ids.shape[0])
    match, deltas = jax.vmap(per_sample)(keys, gt_class_ids, gt_boxes)
    return RPNTargets(match, deltas)


class DetTargets(NamedTuple):
    rois: jax.Array          # [B, R, 4] normalized, zero-padded
    class_ids: jax.Array     # [B, R] int32 (0 = bg/pad)
    deltas: jax.Array        # [B, R, 4] (valid for positives)
    masks: jax.Array         # [B, R, mh, mw] binary
    pos_mask: jax.Array      # [B, R] bool (true positives)
    valid_mask: jax.Array    # [B, R] bool (real sampled rois, pos or neg)


@functools.partial(
    jax.jit,
    static_argnames=("rois_per_image", "positive_ratio", "mask_shape",
                     "use_mini_mask"),
)
def detection_targets(
    key: jax.Array,
    proposals: jax.Array,
    gt_class_ids: jax.Array,
    gt_boxes: jax.Array,
    gt_masks: jax.Array,
    bbox_std_dev: jax.Array,
    rois_per_image: int = 200,
    positive_ratio: float = 0.33,
    mask_shape: Tuple[int, int] = (28, 28),
    use_mini_mask: bool = True,
) -> DetTargets:
    """proposals [B,P,4] normalized; gt_boxes [B,G,4] normalized;
    gt_masks [B,G,mh,mw] (mini-masks or full).

    Static layout: positives occupy slots [0, pos_cap), negatives
    [pos_cap, rois_per_image) — the reference's pos-then-neg concatenation
    (layers.py:344-356) with fixed capacities instead of dynamic counts.
    """
    pos_cap = int(rois_per_image * positive_ratio)
    neg_cap = rois_per_image - pos_cap
    inv_ratio = 1.0 / positive_ratio

    def per_sample(k1, props, cls_ids, boxes, masks):
        valid_gt = cls_ids > 0
        crowd = cls_ids < 0
        valid_prop = jnp.any(props != 0.0, axis=-1)

        iou = box_ops.iou_matrix(props, boxes)
        iou_valid = jnp.where(valid_gt[None, :], iou, -1.0)
        roi_iou_max = jnp.max(iou_valid, axis=1)
        gt_assign = jnp.argmax(iou_valid, axis=1)

        crowd_iou = jnp.where(crowd[None, :], iou, -1.0)
        no_crowd = jnp.max(crowd_iou, axis=1) < 0.001

        pos_bool = (roi_iou_max >= 0.5) & valid_prop
        neg_bool = (roi_iou_max < 0.5) & no_crowd & valid_prop

        kp, kn = jax.random.split(k1)
        pos_idx, pos_valid = _random_topk_mask(kp, pos_bool, pos_cap)
        n_pos = jnp.sum(pos_valid.astype(jnp.int32))
        # neg count follows the reference's int(r*pos - pos) (layers.py:330-331)
        want_neg = jnp.floor(inv_ratio * n_pos - n_pos).astype(jnp.int32)
        neg_idx, neg_avail = _random_topk_mask(kn, neg_bool, neg_cap)
        neg_valid = neg_avail & (jnp.arange(neg_cap) < want_neg)

        idx = jnp.concatenate([pos_idx, neg_idx])
        sel_valid = jnp.concatenate([pos_valid, neg_valid])
        sel_pos = jnp.concatenate(
            [pos_valid, jnp.zeros(neg_cap, bool)])

        rois = props[idx] * sel_valid[:, None]
        roi_gt = gt_assign[idx]
        roi_cls = jnp.where(sel_pos, cls_ids[roi_gt].astype(jnp.int32), 0)
        roi_cls = jnp.maximum(roi_cls, 0)  # crowds can't be sampled but stay safe

        matched_boxes = boxes[roi_gt]
        deltas = box_ops.encode(rois, matched_boxes, eps=1e-8)
        deltas = deltas / jnp.asarray(bbox_std_dev, deltas.dtype)
        deltas = jnp.where(sel_pos[:, None], deltas, 0.0)

        # mask targets: crop each positive RoI out of its GT mask. Positives
        # live statically in slots [0, pos_cap) (the concatenation above),
        # so only that slice is cropped — negative/pad rows would be zeroed
        # anyway and cropping them is ~2/3 of the interpolation work wasted
        p_rois = rois[:pos_cap]
        if use_mini_mask:
            # RoI coords -> normalized mini-mask frame (layers.py:301-312)
            p_matched = matched_boxes[:pos_cap]
            gy1, gx1, gy2, gx2 = [p_matched[:, i] for i in range(4)]
            gh = jnp.maximum(gy2 - gy1, 1e-8)
            gw = jnp.maximum(gx2 - gx1, 1e-8)
            mb = jnp.stack(
                [
                    (p_rois[:, 0] - gy1) / gh,
                    (p_rois[:, 1] - gx1) / gw,
                    (p_rois[:, 2] - gy1) / gh,
                    (p_rois[:, 3] - gx1) / gw,
                ],
                axis=1,
            )
        else:
            mb = p_rois
        roi_masks = masks[roi_gt[:pos_cap]][..., None]       # [P, mh, mw, 1]
        # separable two-matmul crop: C=1 sources are pathological for the
        # gather engine (4-byte rows), ~40x faster as MXU matmuls
        crops = crop_and_resize_separable(roi_masks, mb, mask_shape)[..., 0]
        crops = jnp.round(crops) * sel_pos[:pos_cap, None, None]
        target_masks = jnp.concatenate(
            [crops, jnp.zeros((neg_cap,) + tuple(mask_shape), crops.dtype)])

        return rois, roi_cls, deltas, target_masks, sel_pos, sel_valid

    keys = jax.random.split(key, proposals.shape[0])
    out = jax.vmap(per_sample)(keys, proposals, gt_class_ids, gt_boxes, gt_masks)
    return DetTargets(*out)
