"""Detector losses, as masked reductions (no dynamic gathers).

Parity with ``/root/reference/lib/layers.py:808-934``:

- rpn_class: CE over non-neutral anchors, mean over those anchors;
- rpn_bbox: smooth-L1 over positive anchors, mean over (positives × 4) —
  identical pairing to the reference's packed-buffer form (layers.py:846-855);
- mrcnn_class: CE over **all** RoI slots (padding rows train as background,
  exactly like the reference's dense packing), zero when no targets at all;
- mrcnn_bbox: smooth-L1 on the target-class slice of positive rows, mean over
  (positives × 4);
- mrcnn_mask: binary CE on the target-class mask slice of positive rows,
  mean over (positives × 28 × 28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array) -> jax.Array:
    """Elementwise smooth-L1 (torch F.smooth_l1_loss, beta=1)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    num = jnp.sum(values * mask)
    den = jnp.maximum(jnp.sum(mask), 1.0)
    return num / den


def rpn_class_loss(match: jax.Array, logits: jax.Array) -> jax.Array:
    """match [B,A] (1/-1/0); logits [B,A,2]."""
    target = (match == 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    contribute = (match != 0).astype(jnp.float32)
    return _masked_mean(ce, contribute)


def rpn_bbox_loss(target_deltas: jax.Array, match: jax.Array,
                  pred_deltas: jax.Array) -> jax.Array:
    """target/pred deltas [B,A,4] dense; positives contribute."""
    pos = (match == 1).astype(jnp.float32)[..., None]
    err = smooth_l1(pred_deltas.astype(jnp.float32) - target_deltas)
    return _masked_mean(err, jnp.broadcast_to(pos, err.shape))


def mrcnn_class_loss(target_class_ids: jax.Array, logits: jax.Array) -> jax.Array:
    """target [B,R] int; logits [B,R,K]. Mean CE over every slot (parity)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target_class_ids[..., None], axis=-1)[..., 0]
    loss = jnp.mean(ce)
    has_any = (jnp.sum(target_class_ids) != 0).astype(jnp.float32)
    return loss * has_any


def mrcnn_bbox_loss(target_deltas: jax.Array, target_class_ids: jax.Array,
                    pred_deltas: jax.Array) -> jax.Array:
    """target_deltas [B,R,4]; pred [B,R,K,4]; positives = class > 0."""
    b, r, k, _ = pred_deltas.shape
    cls = jnp.maximum(target_class_ids, 0)
    pred_cls = jnp.take_along_axis(
        pred_deltas, cls[..., None, None].repeat(4, -1), axis=2)[:, :, 0, :]
    pos = (target_class_ids > 0).astype(jnp.float32)[..., None]
    err = smooth_l1(pred_cls.astype(jnp.float32) - target_deltas)
    return _masked_mean(err, jnp.broadcast_to(pos, err.shape))


def mrcnn_mask_loss(target_masks: jax.Array, target_class_ids: jax.Array,
                    pred_masks: jax.Array) -> jax.Array:
    """target [B,R,mh,mw]; pred [B,R,mh,mw,K] (sigmoid outputs)."""
    cls = jnp.maximum(target_class_ids, 0)
    pred_cls = jnp.take_along_axis(
        pred_masks, cls[:, :, None, None, None], axis=-1)[..., 0]
    p = jnp.clip(pred_cls.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    t = target_masks.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    pos = (target_class_ids > 0).astype(jnp.float32)[:, :, None, None]
    return _masked_mean(bce, jnp.broadcast_to(pos, bce.shape))
