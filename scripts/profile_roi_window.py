#!/usr/bin/env python
"""Window-DMA Pallas RoIAlign vs the production XLA row-gather (VERDICT r2 #3).

Times ops/roi_align_window.py::multilevel_roi_align_window against
ops/roi_align.py::multilevel_crop_and_resize on the production shapes
(1024² image pyramid, C=256 bf16, v5e):

  a) inference classifier path: B=32, 32×1000 RoIs, 7²
  b) inference mask/critic path: B=32, 32×100 detections, 14²
  c) train small path:           B=8,  8×200 RoIs, 14²

Run on the chip: python scripts/profile_roi_window.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops.roi_align import (
    assign_fpn_level, multilevel_crop_and_resize)
from feature_intertwiner_tpu.ops.roi_align_window import (
    multilevel_roi_align_window)


def _time(fn, *arrays, reps=7):
    # Timing idiom for the remote (axon) platform (cf.
    # scripts/profile_gather.py::timeit): scalar-reduce inside jit +
    # np.asarray; array operands must be jit ARGUMENTS (closing over them
    # embeds them as constants in the remote compile request -> HTTP 413).
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(f(*arrays))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*arrays))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_case(rng, b, rois_per_im, image=1024, c=256):
    sizes = [image // s for s in (4, 8, 16, 32)]
    feats = [jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16) for s in sizes]
    n = b * rois_per_im
    # plausible RoI mix: log-uniform scale 16..640 px, aspect 0.33..3
    scale = np.exp(rng.uniform(np.log(16), np.log(640), n)) / image
    ar = np.exp(rng.uniform(np.log(0.33), np.log(3.0), n))
    h = np.clip(scale * np.sqrt(ar), 1e-3, 0.98)
    w = np.clip(scale / np.sqrt(ar), 1e-3, 0.98)
    y1 = rng.uniform(0, 1 - h)
    x1 = rng.uniform(0, 1 - w)
    boxes = jnp.asarray(np.stack([y1, x1, y1 + h, x1 + w], 1), jnp.float32)
    bidx = jnp.asarray(np.repeat(np.arange(b), rois_per_im), jnp.int32)
    lvl = jnp.clip(assign_fpn_level(boxes, (image, image)) - 2, 0, 3)
    return feats, boxes, bidx, lvl


def main():
    rng = np.random.RandomState(0)
    cases = [("a:infer-cls 7^2", 32, 1000, (7, 7)),
             ("b:infer-mask 14^2", 32, 100, (14, 14)),
             ("c:train 14^2", 8, 200, (14, 14))]
    want = os.environ.get("CASES", "abc")
    cases = [c for c in cases if c[0][0] in want]
    print(f"{'case':>16} {'N':>6} {'XLA ms':>8} {'window ms':>10} "
          f"{'speedup':>8} {'fit%':>6}")
    for name, b, rpi, crop in cases:
        feats, boxes, bidx, lvl = make_case(rng, b, rpi)
        def xla(fs, bx, bi, lv):
            return multilevel_crop_and_resize(
                fs, bx, bi, crop, (1024, 1024), level_idx=lv)

        def win(fs, bx, bi, lv):
            return multilevel_roi_align_window(fs, bx, bi, lv, crop)[0]

        t_xla = _time(xla, feats, boxes, bidx, lvl)
        try:
            t_win = _time(win, feats, boxes, bidx, lvl)
            a = np.asarray(xla(feats, boxes, bidx, lvl))
            bb = np.asarray(win(feats, boxes, bidx, lvl))
            fits = np.asarray(
                multilevel_roi_align_window(feats, boxes, bidx, lvl,
                                            crop)[1])
            err = np.abs(a[fits].astype(np.float32)
                         - bb[fits].astype(np.float32)).max()
            print(f"{name:>16} {b*rpi:>6} {t_xla*1e3:>8.2f} {t_win*1e3:>10.2f} "
                  f"{t_xla/t_win:>8.2f} {fits.mean()*100:>5.1f}%"
                  f"  maxerr(fit)={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:>16} {b*rpi:>6} {t_xla*1e3:>8.2f}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
