"""Box math, fully vectorized for TPU (no per-sample Python loops).

Semantics parity with ``/root/reference/tools/box_utils.py``:

- boxes are ``(y1, x1, y2, x2)``;
- :func:`decode` applies ``(dy, dx, log(dh), log(dw))`` deltas
  (``apply_box_deltas``, box_utils.py:7-29);
- :func:`encode` computes the refinement from box to gt box
  (``box_refinement``, box_utils.py:89-110);
- :func:`iou_matrix` is the all-pairs IoU with the reference's
  ``union + 1e-19`` stabilizer (``compute_iou``, box_utils.py:113-140) and
  **no** +1 pixel convention (that convention exists only inside NMS);
- :func:`clip` clamps to a window (``clip_boxes``, box_utils.py:32-60).

All functions broadcast over arbitrary leading batch dims; use ``jax.vmap``
freely. Everything is jit-safe (static shapes in, static shapes out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference EPS = 10e-20 (tools/box_utils.py:4).
IOU_EPS = 1e-19


def decode(boxes: jax.Array, deltas: jax.Array) -> jax.Array:
    """Apply ``(dy, dx, log(dh), log(dw))`` deltas to ``(y1,x1,y2,x2)`` boxes.

    Args:
        boxes: [..., 4]
        deltas: [..., 4]
    Returns:
        [..., 4] refined boxes.
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    center_y = center_y + deltas[..., 0] * height
    center_x = center_x + deltas[..., 1] * width
    height = height * jnp.exp(deltas[..., 2])
    width = width * jnp.exp(deltas[..., 3])

    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    # Parity note: the reference computes y2 = y1 + height (not center + h/2);
    # identical algebraically, and identical in fp32 the way we order ops here.
    y2 = y1 + height
    x2 = x1 + width
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def encode(boxes: jax.Array, gt_boxes: jax.Array, eps: float = 0.0) -> jax.Array:
    """Compute deltas that transform ``boxes`` into ``gt_boxes``.

    Args:
        boxes: [..., 4] anchors/proposals.
        gt_boxes: [..., 4] matched ground-truth boxes.
        eps: optional stabilizer added to width/height denominators. The
            reference divides by the raw height/width (box_refinement); pass
            ``eps > 0`` when padded all-zero boxes may appear in the input
            (results for those rows are garbage either way — mask them out).
    Returns:
        [..., 4] ``(dy, dx, log(dh), log(dw))``.
    """
    height = boxes[..., 2] - boxes[..., 0] + eps
    width = boxes[..., 3] - boxes[..., 1] + eps
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    gt_height = gt_boxes[..., 2] - gt_boxes[..., 0] + eps
    gt_width = gt_boxes[..., 3] - gt_boxes[..., 1] + eps
    gt_center_y = gt_boxes[..., 0] + 0.5 * gt_height
    gt_center_x = gt_boxes[..., 1] + 0.5 * gt_width

    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = jnp.log(gt_height / height)
    dw = jnp.log(gt_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def clip(boxes: jax.Array, window: jax.Array) -> jax.Array:
    """Clamp boxes to ``window = (y1, x1, y2, x2)``.

    ``window`` may be [4] (shared) or broadcastable to ``boxes[..., 4]``
    (e.g. [B, 1, 4] for per-sample inference windows — the reference's
    two-dim branch of clip_boxes).
    """
    window = jnp.asarray(window, boxes.dtype)
    y_min, x_min = window[..., 0], window[..., 1]
    y_max, x_max = window[..., 2], window[..., 3]
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], y_min, y_max),
            jnp.clip(boxes[..., 1], x_min, x_max),
            jnp.clip(boxes[..., 2], y_min, y_max),
            jnp.clip(boxes[..., 3], x_min, x_max),
        ],
        axis=-1,
    )


def area(boxes: jax.Array) -> jax.Array:
    """[..., 4] -> [...] box areas (no +1 convention)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def iou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """All-pairs IoU.

    Args:
        boxes1: [..., N, 4]
        boxes2: [..., M, 4]
    Returns:
        [..., N, M] IoU with the reference's ``union + 1e-19`` stabilizer.
    """
    b1 = boxes1[..., :, None, :]  # [..., N, 1, 4]
    b2 = boxes2[..., None, :, :]  # [..., 1, M, 4]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    intersection = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area(b1) + area(b2) - intersection
    return intersection / (union + IOU_EPS)


def boxes_from_masks(masks: jax.Array) -> jax.Array:
    """Tight pixel bounding boxes from binary masks (vectorized).

    Parity with ``extract_bboxes`` (tools/box_utils.py:63-86): returns integer
    ``(y1, x1, y2, x2)`` with the exclusive +1 on y2/x2; all-empty masks give
    a zero box.

    Args:
        masks: [..., H, W] binary (0/1) masks.
    Returns:
        [..., 4] int32 boxes.
    """
    masks = masks.astype(bool)
    h, w = masks.shape[-2], masks.shape[-1]
    row_any = jnp.any(masks, axis=-1)  # [..., H]
    col_any = jnp.any(masks, axis=-2)  # [..., W]
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    big = jnp.int32(10**8)
    y1 = jnp.min(jnp.where(row_any, ys, big), axis=-1)
    y2 = jnp.max(jnp.where(row_any, ys, -1), axis=-1) + 1
    x1 = jnp.min(jnp.where(col_any, xs, big), axis=-1)
    x2 = jnp.max(jnp.where(col_any, xs, -1), axis=-1) + 1
    empty = ~jnp.any(row_any, axis=-1)
    box = jnp.stack([y1, x1, y2, x2], axis=-1)
    return jnp.where(empty[..., None], jnp.zeros_like(box), box).astype(jnp.int32)
