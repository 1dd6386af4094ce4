"""Exact greedy non-max suppression, formulated for TPU/XLA.

The reference implements greedy NMS in C/CUDA (sequential sweep over
score-sorted boxes: ``/root/reference/lib/nms/src/nms.c:35-64``, 64-wide
bitmask kernel ``/root/reference/lib/nms/src/cuda/nms_kernel.cu:26-70`` with a
host-side bitset sweep ``nms_cuda.c:47-58``). A literal translation would be
either a 6000-iteration sequential loop (latency-bound on TPU) or a
device→host sweep (transfer-bound). Instead we use a **block-sequential
sweep with an in-block fixpoint**:

1. sort boxes by score (descending) and pad to a multiple of ``block``;
2. iterate over blocks in order. For block *b*:
   a. suppress candidates overlapped by any *surviving* box of earlier
      blocks (one ``[N, B]`` IoU contraction — parallel on the VPU/MXU);
   b. resolve the within-block greedy recurrence
      ``alive[j] = cand[j] & ~any_{i<j}(alive[i] & iou[i,j] > t)``
      by iterating to a fixpoint (``lax.while_loop``; the recurrence has a
      unique fixpoint equal to the greedy solution and converges in at most
      the length of the longest suppression chain — typically 2-4 sweeps).

Total work is the same O(N²) IoU evaluations as the CUDA bitmask kernel, but
organized into ~N/B large vector steps instead of N scalar steps, and it
stays entirely on device. Results are **bit-exact** with the reference greedy
algorithm (verified against a numpy oracle in tests/test_nms.py).

IoU conventions (both appear in the reference):

* ``plus_one=True`` — the legacy detectron convention ``w = x2-x1+1``
  (nms.c:55-58, nms_kernel.cu:19-21). Default, matching the reference model.
* ``strict=True`` — suppress when ``iou > thresh`` (the CUDA path,
  nms_kernel.cu:63); ``False`` suppresses at ``iou >= thresh`` (the CPU
  path, nms.c:59). Default True (the reference trains/evals on GPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _pairwise_iou(a: jax.Array, b: jax.Array, plus_one: bool) -> jax.Array:
    """IoU between row boxes [N,4] and col boxes [M,4] (y1,x1,y2,x2)."""
    off = 1.0 if plus_one else 0.0
    y1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1 + off, 0.0) * jnp.maximum(y2 - y1 + off, 0.0)
    area_a = (a[:, 2] - a[:, 0] + off) * (a[:, 3] - a[:, 1] + off)
    area_b = (b[:, 2] - b[:, 0] + off) * (b[:, 3] - b[:, 1] + off)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _suppression_matrix(iou: jax.Array, thresh: float, strict: bool) -> jax.Array:
    return (iou > thresh) if strict else (iou >= thresh)


def _greedy_alive_sorted(
    boxes: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    plus_one: bool,
    strict: bool,
    block: int,
    early_exit_count: int = 0,
) -> jax.Array:
    """Greedy-NMS survival mask for boxes already sorted by descending score.

    boxes: [N, 4] with N a multiple of ``block``; valid: [N] bool.
    Returns alive: [N] bool (padding rows are False; with ``early_exit_count``
    > 0, rows after the block containing the ``early_exit_count``-th survivor
    may remain unresolved — exact for selecting the top-k survivors, since a
    lower-scored box can never suppress a higher-scored one).
    """
    n = boxes.shape[0]
    num_blocks = n // block
    positions = jnp.arange(n)

    def outer(b, alive):
        start = b * block
        blk_boxes = lax.dynamic_slice(boxes, (start, 0), (block, 4))
        cand = lax.dynamic_slice(valid, (start,), (block,))

        # (a) cross-block: earlier surviving boxes suppress current block.
        prev_alive = alive & (positions < start)
        iou_prev = _pairwise_iou(boxes, blk_boxes, plus_one)  # [N, B]
        supp_prev = jnp.any(
            _suppression_matrix(iou_prev, iou_threshold, strict) & prev_alive[:, None],
            axis=0,
        )
        cand = cand & ~supp_prev

        # (b) within-block greedy fixpoint on the strict upper triangle.
        iou_blk = _pairwise_iou(blk_boxes, blk_boxes, plus_one)  # [B, B]
        tri = positions[:block, None] < positions[None, :block]
        mat = _suppression_matrix(iou_blk, iou_threshold, strict) & tri

        def cond_fn(state):
            _, changed = state
            return changed

        def body_fn(state):
            a, _ = state
            new = cand & ~jnp.any(mat & a[:, None], axis=0)
            return new, jnp.any(new != a)

        a0 = cand
        a1 = cand & ~jnp.any(mat & a0[:, None], axis=0)
        a_final, _ = lax.while_loop(cond_fn, body_fn, (a1, jnp.any(a1 != a0)))

        return lax.dynamic_update_slice(alive, a_final, (start,))

    if early_exit_count <= 0:
        return lax.fori_loop(0, num_blocks, outer, valid)

    # Early termination: stop once the resolved prefix holds enough
    # survivors — later (lower-scored) boxes cannot change them. BUT the
    # unresolved tail must then be marked dead so it isn't selected.
    def cond(state):
        b, alive = state
        resolved = positions < b * block
        found = jnp.sum((alive & resolved).astype(jnp.int32))
        return (b < num_blocks) & (found < early_exit_count)

    def body(state):
        b, alive = state
        return b + 1, outer(b, alive)

    b_end, alive = lax.while_loop(cond, body, (jnp.int32(0), valid))
    return alive & (positions < b_end * block)


@functools.partial(
    jax.jit,
    static_argnames=("max_output", "plus_one", "strict", "block", "early_exit"),
)
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    max_output: int,
    valid: Optional[jax.Array] = None,
    plus_one: bool = True,
    strict: bool = True,
    block: int = 512,
    early_exit: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS for one sample (vmap over a batch axis for batched use).

    Args:
        boxes: [N, 4] ``(y1, x1, y2, x2)``.
        scores: [N].
        iou_threshold: suppression threshold.
        max_output: static output size.
        valid: optional [N] bool; False rows never participate.
        plus_one / strict / block: see module docstring.

    Returns:
        keep_idx: [max_output] int32 indices into the *input* order, sorted by
            descending score; slots past the keep count are 0.
        keep_valid: [max_output] bool marking real entries.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    scores_eff = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores_eff)  # stable descending
    boxes_sorted = boxes[order]
    valid_sorted = valid[order]

    pad = (-n) % block
    if pad:
        boxes_sorted = jnp.pad(boxes_sorted, ((0, pad), (0, 0)))
        valid_sorted = jnp.pad(valid_sorted, (0, pad))

    alive = _greedy_alive_sorted(
        boxes_sorted, valid_sorted, iou_threshold, plus_one, strict, block,
        early_exit_count=max_output if early_exit else 0,
    )[:n]

    # Compact surviving sorted positions into [max_output] (score order).
    slot = jnp.cumsum(alive) - 1  # target slot for each surviving row
    in_range = alive & (slot < max_output)
    keep_idx = jnp.zeros((max_output,), jnp.int32).at[
        jnp.where(in_range, slot, max_output)  # dropped rows scatter OOB
    ].set(order.astype(jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(alive.astype(jnp.int32)), max_output)
    keep_valid = jnp.arange(max_output) < count
    return keep_idx, keep_valid


def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    max_output: int,
    valid: Optional[jax.Array] = None,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """NMS over a leading batch dim. boxes [B,N,4], scores [B,N].

    Unlike the reference batch wrapper — which truncates every sample to the
    *minimum* keep count across the batch (nms_wrapper.py:25-33, SURVEY.md
    §3.5 quirk 3) — each sample keeps its own detections up to ``max_output``
    with an explicit validity mask. The reference's truncation is an artifact
    of dense-tensor packing, not intent; padded slots here are masked instead.
    """
    fn = functools.partial(
        nms, iou_threshold=iou_threshold, max_output=max_output, **kwargs
    )
    if valid is None:
        return jax.vmap(lambda b, s: fn(b, s))(boxes, scores)
    return jax.vmap(lambda b, s, v: fn(b, s, valid=v))(boxes, scores, valid)


def class_aware_nms(
    boxes: jax.Array,
    scores: jax.Array,
    class_ids: jax.Array,
    iou_threshold: float,
    max_output: int,
    valid: Optional[jax.Array] = None,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Per-class NMS in one fused call (single sample; vmap for batches).

    The reference loops over classes with a separate NMS per class
    (conduct_nms, /root/reference/lib/layers.py:664-717). Equivalent result,
    TPU-friendly: shift each class's boxes into a disjoint coordinate island
    so cross-class IoU is exactly zero, then run one global NMS. Survivors and
    their score ordering match the per-class loop + global top-k exactly.
    """
    span = jnp.max(jnp.abs(boxes)) + 2.0  # > any coordinate extent (+1 conv.)
    offsets = class_ids.astype(boxes.dtype)[:, None] * span * 4.0
    shifted = boxes + offsets
    return nms(
        shifted, scores, iou_threshold, max_output, valid=valid, **kwargs
    )
