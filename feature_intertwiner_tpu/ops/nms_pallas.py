"""Pallas NMS: the whole greedy sweep as ONE fused TPU kernel.

The XLA formulation (ops/nms.py) runs ~N/block sequential device steps with
host-visible control flow between them; this kernel keeps the score-sorted
boxes resident in VMEM (6k boxes ≈ 100KB) and runs the entire
cross-block-suppression + in-block-fixpoint sweep inside one `pallas_call` —
the TPU analogue of the reference's single CUDA bitmask kernel
(`/root/reference/lib/nms/src/cuda/nms_kernel.cu:26-70`) *including* the
host bitset sweep it needed afterwards (`nms_cuda.c:47-58`).

Layout strategy (per the Mosaic constraints catalogued in ops/roi_align.py):
everything lane-aligned. The alive mask lives as a [1, N] lane vector;
suppression "does i kill j" matrices are built with i on sublanes and j on
lanes so both the cross-block reduction and the in-block fixpoint are plain
2-D matmuls:

- cross-block:  supp[1,B] = alive_prev[1,N] @ S[N,B]
- in-block:     kill[1,B] = a[1,B] @ M[B,B]   (iterated to the greedy fixpoint)

Inputs are pre-sorted by descending score (same contract as
`_greedy_alive_sorted`); outputs are bit-identical to the XLA path (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_matrix_parts(y1i, x1i, y2i, x2i, y1j, x1j, y2j, x2j, off):
    """IoU with i broadcast on sublanes, j on lanes."""
    yy1 = jnp.maximum(y1i, y1j)
    xx1 = jnp.maximum(x1i, x1j)
    yy2 = jnp.minimum(y2i, y2j)
    xx2 = jnp.minimum(x2i, x2j)
    inter = jnp.maximum(xx2 - xx1 + off, 0.0) * jnp.maximum(yy2 - yy1 + off, 0.0)
    ai = (y2i - y1i + off) * (x2i - x1i + off)
    aj = (y2j - y1j + off) * (x2j - x1j + off)
    return inter / (ai + aj - inter)


def _nms_kernel(boxes_sub_ref, boxes_lane_ref, valid_ref, alive_ref,
                *, n, block, thresh, plus_one, strict):
    """boxes_sub_ref [1, N, 4] VMEM (i layouts), boxes_lane_ref [1, 4, N]
    VMEM (j layouts), valid_ref [1, 1, N], alive_ref out [1, 1, N] f32."""
    off = 1.0 if plus_one else 0.0
    nb = n // block
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    alive_ref[0] = valid_ref[0]

    def outer(b, _):
        start = pl.multiple_of(b * block, block)

        # block coordinates, j on lanes [1, B]
        y1j = boxes_lane_ref[0, 0:1, pl.ds(start, block)]
        x1j = boxes_lane_ref[0, 1:2, pl.ds(start, block)]
        y2j = boxes_lane_ref[0, 2:3, pl.ds(start, block)]
        x2j = boxes_lane_ref[0, 3:4, pl.ds(start, block)]

        # ---- cross-block suppression: earlier survivors kill the block ----
        # S [N, B]: i (all boxes) on sublanes, j (block) on lanes
        y1i = boxes_sub_ref[0, :, 0:1]
        x1i = boxes_sub_ref[0, :, 1:2]
        y2i = boxes_sub_ref[0, :, 2:3]
        x2i = boxes_sub_ref[0, :, 3:4]
        iou_all = _iou_matrix_parts(y1i, x1i, y2i, x2i, y1j, x1j, y2j, x2j, off)
        s_mat = (iou_all > thresh) if strict else (iou_all >= thresh)

        prev_alive = alive_ref[0] * (lane_pos < start).astype(jnp.float32)
        supp = jax.lax.dot_general(
            prev_alive, s_mat.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )                                                    # [1, B]
        cand = alive_ref[0, 0:1, pl.ds(start, block)] * (supp == 0.0)

        # ---- in-block greedy fixpoint --------------------------------------
        # M [B, B]: i on sublanes kills j on lanes, strictly upper triangular
        y1bi = boxes_sub_ref[0, pl.ds(start, block), 0:1]
        x1bi = boxes_sub_ref[0, pl.ds(start, block), 1:2]
        y2bi = boxes_sub_ref[0, pl.ds(start, block), 2:3]
        x2bi = boxes_sub_ref[0, pl.ds(start, block), 3:4]
        iou_blk = _iou_matrix_parts(y1bi, x1bi, y2bi, x2bi,
                                    y1j, x1j, y2j, x2j, off)
        sup_blk = (iou_blk > thresh) if strict else (iou_blk >= thresh)
        row_i = lax.broadcasted_iota(jnp.int32, (block, block), 0)
        col_j = lax.broadcasted_iota(jnp.int32, (block, block), 1)
        m_mat = (sup_blk & (row_i < col_j)).astype(jnp.float32)

        def fix_cond(state):
            _, changed = state
            return changed

        def fix_body(state):
            a, _ = state
            kill = jax.lax.dot_general(
                a, m_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            new = cand * (kill == 0.0)
            return new, jnp.any(new != a)

        a1, ch = fix_body((cand, True))
        a_fin, _ = lax.while_loop(fix_cond, fix_body, (a1, ch))

        alive_ref[0, 0:1, pl.ds(start, block)] = a_fin
        return 0

    lax.fori_loop(0, nb, outer, 0)


def nms_alive_pallas(
    boxes_sorted: jax.Array,
    valid_sorted: jax.Array,
    iou_threshold: float,
    plus_one: bool = True,
    strict: bool = True,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Greedy-NMS survival mask for ONE sample of score-sorted boxes.

    boxes_sorted [N, 4] (N multiple of `block`), valid_sorted [N] bool.
    Returns alive [N] bool. vmap-compatible (leading batch dim becomes the
    pallas grid when used through `nms_alive_pallas_batched`).
    """
    n = boxes_sorted.shape[0]
    return nms_alive_pallas_batched(
        boxes_sorted[None], valid_sorted[None], iou_threshold,
        plus_one=plus_one, strict=strict, block=block, interpret=interpret,
    )[0]


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "plus_one", "strict", "block",
                     "interpret"),
)
def nms_alive_pallas_batched(
    boxes_sorted: jax.Array,
    valid_sorted: jax.Array,
    iou_threshold: float,
    plus_one: bool = True,
    strict: bool = True,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Batched form: boxes [BATCH, N, 4], valid [BATCH, N] -> alive bool."""
    bsz, n, _ = boxes_sorted.shape
    assert n % block == 0, (n, block)
    kernel = functools.partial(
        _nms_kernel, n=n, block=block, thresh=float(iou_threshold),
        plus_one=plus_one, strict=strict)
    boxes_lane = boxes_sorted.transpose(0, 2, 1)            # [BATCH, 4, N]
    valid_f = valid_sorted.astype(jnp.float32)[:, None, :]  # [BATCH, 1, N]
    alive = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(boxes_sorted, boxes_lane, valid_f)
    return alive[:, 0, :] > 0.5
