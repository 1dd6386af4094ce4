#!/usr/bin/env python
"""End-to-end validation of TPU.ROI_WINDOW_KERNEL on the chip.

Runs the same weights + images through the full inference forward with the
window-DMA RoIAlign on and off and reports detection-level agreement
(matched-box IoU, score deltas, count differences). The kernel is
bf16-exact only to rounding (maxerr ~2e-2 on pooled features vs the bf16
XLA path), so the acceptance criterion is detection-level: near-identical
boxes/scores, not bitwise equality.

Run on the chip: python scripts/validate_roi_window.py [batch=4] [size=1024]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.ops.boxes import iou_matrix


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32)
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, size, size]], jnp.float32),
                       (batch, 1))

    def build(use_window):
        return InterNet(backbone="resnet50", num_classes=81, image_size=size,
                        dev_switch=True, dev_loss_choice="l2",
                        dev_upsample_fac=1.0, roi_window_kernel=use_window,
                        dtype=jnp.bfloat16)

    m0 = build(False)
    variables = jax.jit(lambda: m0.init({"params": jax.random.PRNGKey(0)},
                                        images, mode="inference",
                                        windows=windows))()
    outs = {}
    for flag in (False, True):
        m = build(flag)
        f = jax.jit(lambda v, im, w, m=m: m.apply(v, im, mode="inference",
                                                  windows=w))
        outs[flag] = np.asarray(f(variables, images, windows)["detections"])

    a, b = outs[False], outs[True]
    # detections: [B, K, 6] = y1,x1,y2,x2,class,score ; zero rows = padding
    for bi in range(batch):
        da = a[bi][a[bi, :, 5] > 0]
        db = b[bi][b[bi, :, 5] > 0]
        print(f"image {bi}: {len(da)} vs {len(db)} detections")
        if len(da) == 0 or len(db) == 0:
            continue
        ious = np.asarray(iou_matrix(jnp.asarray(da[:, :4]),
                                     jnp.asarray(db[:, :4])))
        best = ious.max(axis=1)
        match = ious.argmax(axis=1)
        cls_eq = (da[:, 4] == db[match, 4]).mean()
        ds = np.abs(da[:, 5] - db[match, 5])
        print(f"  matched IoU: mean {best.mean():.4f} min {best.min():.4f}; "
              f"class agreement {cls_eq:.3f}; score |delta| mean "
              f"{ds.mean():.4f} max {ds.max():.4f}")


if __name__ == "__main__":
    main()
