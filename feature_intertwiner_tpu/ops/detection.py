"""Inference detection layer: refine, filter, per-class NMS, top-k.

Capability parity with ``detection_layer`` / ``conduct_nms``
(``/root/reference/lib/layers.py:664-802``):

- per-RoI argmax class over all classes (background included in the argmax,
  then filtered);
- class-specific delta, × BBOX_STD_DEV, decode, scale to pixels, clip to the
  per-sample un-padded window, **round** to integer pixels;
- drop background / low-score / zero-area boxes;
- per-class NMS at DET_NMS_THRESHOLD (the reference's per-class Python loop
  becomes one fused class-offset NMS — ops/nms.py), top DET_MAX_INSTANCES by
  score;
- output [B, DET_MAX_INSTANCES, 6] = (y1, x1, y2, x2, class_id, score),
  zero-padded, plus the surviving RoI indices (for the visualize phase's
  feature passthrough, lib/layers.py:798-800).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops
from .nms import class_aware_nms


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "max_instances", "nms_threshold",
                     "min_confidence"),
)
def detection_layer(
    rois: jax.Array,
    probs: jax.Array,
    deltas: jax.Array,
    windows: jax.Array,
    bbox_std_dev: jax.Array,
    image_size: Tuple[int, int],
    max_instances: int = 100,
    nms_threshold: float = 0.3,
    min_confidence: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """rois [B,R,4] normalized; probs [B,R,K]; deltas [B,R,K,4];
    windows [B,4] pixel (y1,x1,y2,x2) of the un-padded image region.

    Returns (detections [B,M,6], keep_idx [B,M] into R, keep_valid [B,M]).
    """
    h, w = image_size
    scale = jnp.array([h, w, h, w], jnp.float32)

    def per_sample(roi, p, d, win):
        class_ids = jnp.argmax(p, axis=-1)                       # [R]
        class_scores = jnp.max(p, axis=-1)
        d_spec = d[jnp.arange(d.shape[0]), class_ids]            # [R, 4]
        d_spec = d_spec * jnp.asarray(bbox_std_dev, jnp.float32)
        refined = box_ops.decode(roi, d_spec) * scale
        refined = box_ops.clip(refined, win)
        refined = jnp.round(refined)

        area = (refined[:, 0] - refined[:, 2]) * (refined[:, 1] - refined[:, 3])
        keep = (class_ids > 0) & (class_scores >= min_confidence) & (area > 0)

        keep_idx, keep_valid = class_aware_nms(
            refined, class_scores, class_ids, nms_threshold, max_instances,
            valid=keep)
        v = keep_valid.astype(jnp.float32)[:, None]
        det = jnp.concatenate(
            [
                refined[keep_idx] * v,
                class_ids[keep_idx][:, None].astype(jnp.float32) * v,
                class_scores[keep_idx][:, None] * v,
            ],
            axis=1,
        )
        return det, keep_idx, keep_valid

    return jax.vmap(per_sample)(rois, probs, deltas, windows)
