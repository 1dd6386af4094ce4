"""Proposal layer: RPN outputs → top-scoring NMS'd proposals.

Capability parity with ``proposal_layer``
(``/root/reference/lib/layers.py:71-139``): take fg scores, keep top
``pre_nms_limit`` anchors per sample, apply deltas × BBOX_STD_DEV, clip to the
image, greedy-NMS at ``nms_threshold``, keep ``proposal_count``, normalize to
[0, 1]. Fully batched (vmap) with static shapes; short samples are zero-padded
(the reference's batch-min truncation quirk — SURVEY.md §3.5 #3 — is replaced
by per-sample padding, see ops/nms.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops
from .nms import nms


@functools.partial(
    jax.jit,
    static_argnames=("pre_nms_limit", "proposal_count", "nms_threshold",
                     "image_size"),
)
def proposal_layer(
    rpn_probs: jax.Array,
    rpn_deltas: jax.Array,
    anchors: jax.Array,
    bbox_std_dev: jax.Array,
    image_size: Tuple[int, int],
    pre_nms_limit: int = 6000,
    proposal_count: int = 1000,
    nms_threshold: float = 0.7,
) -> jax.Array:
    """Returns normalized proposals [B, proposal_count, 4], zero-padded.

    rpn_probs [B, A, 2]; rpn_deltas [B, A, 4]; anchors [A, 4] in pixels.
    """
    h, w = image_size
    scores = rpn_probs[:, :, 1]
    deltas = rpn_deltas * jnp.asarray(bbox_std_dev, rpn_deltas.dtype)

    def per_sample(s, d):
        k = min(pre_nms_limit, s.shape[0])
        top_scores, order = jax.lax.top_k(s, k)
        top_deltas = d[order]
        top_anchors = anchors[order]
        decoded = box_ops.decode(top_anchors, top_deltas)
        clipped = box_ops.clip(decoded, jnp.array([0.0, 0.0, h, w], decoded.dtype))
        keep_idx, keep_valid = nms(
            clipped, top_scores, nms_threshold, proposal_count)
        kept = clipped[keep_idx] * keep_valid[:, None].astype(clipped.dtype)
        return kept / jnp.array([h, w, h, w], clipped.dtype)

    return jax.vmap(per_sample)(scores, deltas)
