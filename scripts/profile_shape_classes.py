#!/usr/bin/env python
"""Shape-classed RoI windows: fit rates + eval-classifier pooling cost
(VERDICT r4 #3 — the door named in the round-4 roadmap).

Measures, on the production inference-classifier shapes (B=32, 32x1000
proposals, 7^2, 1024^2 bf16 pyramid):

  1. fit rates: single (32, 40) window vs the shape-class set
     (shape_class_windows) on the proposal noise-tail mix;
  2. hybrid pooling time: round-4 shipping config (single class, n//4
     exact-XLA fallback) vs round-5 (3 classes, n//16 fallback);
  3. value agreement of the round-5 config vs the exact XLA gather
     (max |diff| over the noise-tail mix — must stay at bf16 epsilon).

Run on the chip: python scripts/profile_shape_classes.py
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
    multilevel_crop_and_resize_window, shape_class_windows,
    window_origins_and_fits, phys_widths_for)


def _time(fn, *arrays, reps=7):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(f(*arrays))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*arrays))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def noise_tail_mix(rng, b, rois_per_im, image=1024, frac_noise=0.3,
                   noise_ratio_max=24.0):
    """Proposal-list-like mix: 70% object-like (aspect <= 3), 30% noise
    tail with aspects up to 24 — the eval classifier's measured regime
    (~12.7% single-window unfit, results/audit/)."""
    n = b * rois_per_im
    n_noise = int(n * frac_noise)
    scale = np.exp(rng.uniform(np.log(16), np.log(640), n)) / image
    ar = np.exp(rng.uniform(np.log(0.33), np.log(3.0), n))
    ar[:n_noise] = np.exp(rng.uniform(-np.log(noise_ratio_max),
                                      np.log(noise_ratio_max), n_noise))
    h = np.clip(scale * np.sqrt(ar), 1e-3, 0.98)
    w = np.clip(scale / np.sqrt(ar), 1e-3, 0.98)
    y1 = rng.uniform(0, 1 - h)
    x1 = rng.uniform(0, 1 - w)
    boxes = jnp.asarray(np.stack([y1, x1, y1 + h, w + x1], 1), jnp.float32)
    bidx = jnp.asarray(np.repeat(np.arange(b), rois_per_im), jnp.int32)
    lvl = jnp.clip(assign_fpn_level(boxes, (image, image)) - 2, 0, 3)
    return boxes, bidx, lvl


def fit_rates(boxes, lvl, image=1024):
    sizes = [image // s for s in (4, 8, 16, 32)]
    heights = jnp.asarray(sizes, jnp.int32)
    widths = jnp.asarray(sizes, jnp.int32)
    windows = shape_class_windows((32, 40))
    sy_max = max(sy for sy, _ in windows)
    sx_max = max(sx for _, sx in windows)
    ph = jnp.maximum(heights, sy_max)
    pw = phys_widths_for(widths, sx_max)
    out = {}
    fits_any = None
    for k, w in enumerate(windows):
        _, _, f = window_origins_and_fits(
            boxes, lvl, heights, widths, (7, 7), w,
            phys_widths=pw, phys_heights=ph)
        f = np.asarray(f)
        out[f"class{k}_{w}"] = float(f.mean())
        fits_any = f if fits_any is None else (fits_any | f)
    out["any_class"] = float(fits_any.mean())
    return out


def main():
    rng = np.random.RandomState(0)
    image, b, rpi, c = 1024, 32, 1000, 256
    sizes = [image // s for s in (4, 8, 16, 32)]
    feats = [jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16) for s in sizes]
    boxes, bidx, lvl = noise_tail_mix(rng, b, rpi, image)

    rates = fit_rates(boxes, lvl, image)
    print("fit rates (noise-tail mix, n=%d):" % boxes.shape[0])
    for k, v in rates.items():
        print(f"  {k:24s} {100 * v:6.2f}%")

    crop = (7, 7)

    def round4(fs, bx, bi, lv):  # shipping config before this round
        return multilevel_crop_and_resize_window(
            fs, bx, bi, crop, (image, image), level_idx=lv,
            fallback_div=4, shape_classes=False)

    def round5(fs, bx, bi, lv):
        return multilevel_crop_and_resize_window(
            fs, bx, bi, crop, (image, image), level_idx=lv,
            fallback_div=16, shape_classes=True)

    def xla(fs, bx, bi, lv):
        return multilevel_crop_and_resize(
            list(fs), bx, bi, crop, (image, image), level_idx=lv)

    t4 = _time(lambda *a: round4(a[:4], *a[4:]), *feats, boxes, bidx, lvl)
    t5 = _time(lambda *a: round5(a[:4], *a[4:]), *feats, boxes, bidx, lvl)
    tx = _time(lambda *a: xla(a[:4], *a[4:]), *feats, boxes, bidx, lvl)
    print(f"eval-classifier pooling 32x1000 RoIs 7^2:")
    print(f"  XLA gather                 {tx * 1e3:8.2f} ms")
    print(f"  round-4 (1 class, n//4)    {t4 * 1e3:8.2f} ms")
    print(f"  round-5 (3 classes, n//16) {t5 * 1e3:8.2f} ms "
          f"({t4 / t5:.2f}x vs round-4, {tx / t5:.2f}x vs gather)")

    got = np.asarray(jax.jit(round5)(tuple(feats), boxes, bidx,
                                     lvl)).astype(np.float32)
    ref = np.asarray(jax.jit(xla)(tuple(feats), boxes, bidx,
                                  lvl)).astype(np.float32)
    denom = max(1.0, float(np.abs(ref).max()))
    print(f"  round-5 vs gather max|diff| {np.abs(got - ref).max():.5f} "
          f"(rel {np.abs(got - ref).max() / denom:.2e}) "
          "— bf16 pooling epsilon expected")


if __name__ == "__main__":
    main()
