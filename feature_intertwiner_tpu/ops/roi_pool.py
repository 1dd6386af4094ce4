"""RoIPool (quantized max-pool) for TPU.

Semantics parity with the reference CUDA kernel
(``/root/reference/lib/roi_pooling/src/roi_pooling_kernel.cu:24-93``):

- RoIs are ``(batch_idx, x1, y1, x2, y2)`` in *pixels*; the kernel rounds
  ``coord * spatial_scale`` to feature-map cells;
- malformed RoIs are forced to 1×1 (``max(end-start+1, 1)``);
- bin (ph, pw) covers ``[floor(ph·bh), ceil((ph+1)·bh)) + start``, clipped to
  the map; empty bins output 0;
- output is the max over the bin window (the CUDA argmax exists only to route
  the backward — autodiff through ``max`` reproduces it exactly, without the
  reference's per-element argmax-rescan backward, roi_pooling_kernel.cu:128-203).

TPU formulation: window extents are data-dependent, so the max is computed
over a **static** ``window_cap × window_cap`` sample grid per bin. Samples
are spread evenly across the bin window (``start + k·(span−1)//(cap−1)``):
for bins spanning ≤ ``window_cap`` cells every cell is sampled — the max is
EXACT — and wider bins degrade to an evenly-strided subsampled max that
always covers both window endpoints (never a truncated prefix). With FPN
level assignment the default cap of 8 is exact for every RoI pooled at its
assigned level; the intertwiner's cross-level "big" pooling (large RoIs on
fine maps) can exceed it and gets the strided approximation.

Measured divergence (scripts/profile_roipool_cap.py, 14² pooling of the
big-set box mix at 1024²): P4+ exact at cap 8; P3 (span ≤ 11) exact at
cap 12; only P2 (span ≤ 20) diverges materially — at cap 8, ~18-20% of
bins differ with mean relative error 2.4% (smooth maps) / 4.4% (noise);
cap 16 cuts that to ~1.2% of bins at ≤0.2% mean. Exactness everywhere
costs K² gather volume (cap 20 on P2 ≈ 6× the bytes of cap 8) — set
``ROIS.WINDOW_CAP=0`` for exact-per-level caps when that's worth it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -3.4e38


@functools.partial(
    jax.jit, static_argnames=("pooled_size", "window_cap")
)
def roi_pool(
    features: jax.Array,
    rois: jax.Array,
    spatial_scale: float,
    pooled_size: Tuple[int, int],
    window_cap: int = 8,
) -> jax.Array:
    """Max RoIPool.

    Args:
        features: [B, H, W, C] (NHWC).
        rois: [N, 5] ``(batch_idx, x1, y1, x2, y2)`` in pixels.
        spatial_scale: feature-map cells per pixel (e.g. 1/4 for P2).
        pooled_size: (ph, pw).
        window_cap: static per-bin window bound (see module docstring).

    Returns:
        [N, ph, pw, C] pooled maxima (empty bins = 0).
    """
    b, h, w, c = features.shape
    n = rois.shape[0]
    ph, pw = pooled_size

    batch_idx = rois[:, 0].astype(jnp.int32)
    # round() in the CUDA kernel is round-half-away; jnp.round is half-even.
    # Use floor(x + 0.5) to match C round() for non-negative coords.
    def c_round(x):
        return jnp.floor(x + 0.5).astype(jnp.int32)

    start_w = c_round(rois[:, 1] * spatial_scale)
    start_h = c_round(rois[:, 2] * spatial_scale)
    end_w = c_round(rois[:, 3] * spatial_scale)
    end_h = c_round(rois[:, 4] * spatial_scale)

    roi_w = jnp.maximum(end_w - start_w + 1, 1)                       # [N] int
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    # Bin edges are the rationals p·roi/pool — computed in exact integer
    # arithmetic (floor -> //, ceil -> (a+b-1)//b). The CUDA kernel does this
    # in fp32 (bin_size = (float)roi/pool), which can overrun a window by one
    # cell when (p+1)·bin rounds epsilon above an integer; integer math is the
    # exact semantics and is stable under XLA's div->mul-by-reciprocal rewrite.
    p_h = jnp.arange(ph, dtype=jnp.int32)
    p_w = jnp.arange(pw, dtype=jnp.int32)
    hstart = (p_h[None, :] * roi_h[:, None]) // ph                    # [N, ph]
    hend = ((p_h[None, :] + 1) * roi_h[:, None] + ph - 1) // ph
    wstart = (p_w[None, :] * roi_w[:, None]) // pw                    # [N, pw]
    wend = ((p_w[None, :] + 1) * roi_w[:, None] + pw - 1) // pw

    hstart = jnp.clip(hstart + start_h[:, None], 0, h)
    hend = jnp.clip(hend + start_h[:, None], 0, h)
    wstart = jnp.clip(wstart + start_w[:, None], 0, w)
    wend = jnp.clip(wend + start_w[:, None], 0, w)

    flat = features.reshape(b * h * w, c)
    base = batch_idx * (h * w)                                            # [N]

    # evenly-strided sample offsets: exact for span <= cap (hits every cell
    # since the increment (span-1)/(cap-1) <= 1), full-window strided max
    # beyond (both endpoints always sampled)
    k = jnp.arange(window_cap)

    def offsets(start, end):
        span = (end - start)[:, :, None]                      # [N, P, 1]
        if window_cap > 1:
            off = (k[None, None, :] * jnp.maximum(span - 1, 0)) // (
                window_cap - 1)
        else:
            off = jnp.zeros_like(span) * k[None, None, :]
        pos = start[:, :, None] + off                         # [N, P, K]
        return pos, pos < end[:, :, None]

    ys, ys_valid = offsets(hstart, hend)
    ys = jnp.clip(ys, 0, h - 1)
    xs, xs_valid = offsets(wstart, wend)
    xs = jnp.clip(xs, 0, w - 1)

    # Gather the full [N, ph, K, pw, K, C] sample block in one take.
    idx = (
        base[:, None, None, None, None]
        + ys[:, :, :, None, None] * w
        + xs[:, None, None, :, :]
    )  # [N, ph, K, pw, K]
    samples = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        n, ph, window_cap, pw, window_cap, c
    )
    mask = (ys_valid[:, :, :, None, None] & xs_valid[:, None, None, :, :])[..., None]
    samples = jnp.where(mask, samples, NEG)
    pooled = jnp.max(samples, axis=(2, 4))                                # [N, ph, pw, C]

    empty = (hend <= hstart)[:, :, None, None] | (wend <= wstart)[:, None, :, None]
    return jnp.where(empty, 0.0, pooled)


def make_roi_pool_input(
    boxes: jax.Array, box_indices: jax.Array, image_size: float
) -> jax.Array:
    """Normalized (y1,x1,y2,x2) boxes -> RoIPool's pixel (idx,x1,y1,x2,y2).

    Parity with Dev._make_roi_pool_box_input
    (/root/reference/lib/sub_module.py:686-692), including scaling both axes
    by the image *height* (the reference assumes square inputs).
    """
    p = boxes * image_size
    return jnp.stack(
        [box_indices.astype(boxes.dtype), p[:, 1], p[:, 0], p[:, 3], p[:, 2]],
        axis=1,
    )
