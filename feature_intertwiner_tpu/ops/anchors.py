"""FPN anchor (prior) generation — computed once at model build, on host.

Semantics parity with ``generate_priors`` / ``generate_pyramid_priors``
(``/root/reference/lib/layers.py:9-65``): per pyramid level one scale and all
ratios; anchor centers at ``(cell_y * stride, cell_x * stride)`` (no half-cell
offset); heights ``scale/sqrt(ratio)``, widths ``scale*sqrt(ratio)``; corner
form ``center ± size/2``. Ordering matches the reference exactly: levels in
scale order, cells row-major over (y, x), ratio index fastest.

For the default 1024² COCO config this yields 261,888 anchors
(256²·3 + 128²·3 + 64²·3 + 32²·3 + 16²·3).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def generate_level_anchors(
    scale: float,
    ratios: Sequence[float],
    feature_shape: Sequence[int],
    feature_stride: int,
    anchor_stride: int = 1,
) -> np.ndarray:
    """Anchors for one pyramid level. Returns [H*W*A, 4] float32 (y1,x1,y2,x2)."""
    ratios = np.asarray(ratios, dtype=np.float64)
    heights = scale / np.sqrt(ratios)           # [A]
    widths = scale * np.sqrt(ratios)            # [A]

    shifts_y = np.arange(0, feature_shape[0], anchor_stride, dtype=np.float64) * feature_stride
    shifts_x = np.arange(0, feature_shape[1], anchor_stride, dtype=np.float64) * feature_stride

    # Centers [H, W, 1, 2] (y, x), row-major; sizes [1, 1, A, 2] (h, w).
    ctr = np.stack(np.meshgrid(shifts_x, shifts_y)[::-1], axis=-1)[:, :, None, :]
    size = np.stack([heights, widths], axis=-1)[None, None, :, :]

    boxes = np.concatenate([ctr - 0.5 * size, ctr + 0.5 * size], axis=-1)
    return boxes.reshape(-1, 4).astype(np.float32)


def generate_pyramid_anchors(
    scales: Sequence[float],
    ratios: Sequence[float],
    feature_shapes: Sequence[Sequence[int]],
    feature_strides: Sequence[int],
    anchor_stride: int = 1,
) -> np.ndarray:
    """All-level anchors concatenated in scale order. [N, 4] float32."""
    return np.concatenate(
        [
            generate_level_anchors(scales[i], ratios, feature_shapes[i],
                                   feature_strides[i], anchor_stride)
            for i in range(len(scales))
        ],
        axis=0,
    )


def anchors_for_config(config) -> np.ndarray:
    """Anchors from a finalized Config (parity: lib/model.py:58-61)."""
    return generate_pyramid_anchors(
        config.RPN.ANCHOR_SCALES,
        config.RPN.ANCHOR_RATIOS,
        config.MODEL.BACKBONE_SHAPES,
        config.MODEL.BACKBONE_STRIDES,
        config.RPN.ANCHOR_STRIDE,
    )
