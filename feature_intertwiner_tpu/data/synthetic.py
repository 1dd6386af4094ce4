"""Synthetic COCO-format dataset generator.

The reference's de-facto smoke test is QUICK_VERIFY on real minival
(SURVEY.md §4); this environment has no COCO download path (zero egress), so
integration tests and QUICK_VERIFY runs use a generated dataset with the
exact COCO layout: ``<root>/annotations/instances_minival<year>.json`` +
``<root>/val<year>/*.png`` with simple colored rectangles/ellipses as
instances (polygon segmentations).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
from PIL import Image

CATEGORIES = [
    {"id": 1, "name": "box", "supercategory": "shape"},
    {"id": 2, "name": "disk", "supercategory": "shape"},
    {"id": 3, "name": "stripe", "supercategory": "shape"},
]

# 8-class shape set for the held-out generalization benchmark
# (scripts/ablation_check.py): classes are separable by SHAPE only — color is
# random per instance — so recognition requires learned features, and each
# class occurs at both large and small scales (the intertwiner's regime:
# reliable large-object features guiding the less-reliable small set,
# /root/reference/lib/model.py:143-224).
RICH_NAMES = ["box", "disk", "stripe", "triangle", "ring", "cross",
              "diamond", "checker"]
RICH_CATEGORIES = [
    {"id": i + 1, "name": n, "supercategory": "shape"}
    for i, n in enumerate(RICH_NAMES)
]
# Class-correlated base colors (jittered per instance): like real object
# classes, identity is cued by shape AND appearance. Shape-only classes
# (random color) make 8-way classification of 10-25 px instances
# near-chance at this dataset scale — diagnosed on a 300-image run where
# localization worked but disk/diamond/ring collapsed into one class.
RICH_COLORS = np.array([
    [205, 45, 45],    # box: red
    [45, 185, 65],    # disk: green
    [225, 205, 45],   # stripe: yellow
    [55, 85, 225],    # triangle: blue
    [205, 65, 205],   # ring: magenta
    [45, 205, 205],   # cross: cyan
    [235, 140, 35],   # diamond: orange
    [135, 65, 225],   # checker: purple
], np.int32)


def generate(root: str, num_images: int = 8, size: Tuple[int, int] = (240, 320),
             year: str = "2014", split: str = "minival", seed: int = 0,
             max_instances: int = 4, small_frac: float = 0.0,
             medium_frac: float = 0.0) -> str:
    """Write a synthetic dataset; returns the annotation json path.

    ``small_frac`` / ``medium_frac``: fractions of instances drawn inside
    the COCO 'small' (< 32², sides 10-31 px) and 'medium' (32²..96²,
    sides 34-90 px) area buckets — the default draw (30..dim/2 px) lands
    mostly in 'large', which makes the area-bucket stats
    one-detection-granular even at 128 images
    (scripts/audit_roi_window.py gates all 12 stats and needs ~100+
    instances per bucket for a 0.02 tolerance)."""
    rng = np.random.RandomState(seed)
    h, w = size
    img_dir = os.path.join(root, f"val{year}")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        canvas = rng.randint(0, 60, (h, w, 3)).astype(np.uint8)
        n = rng.randint(1, max_instances + 1)
        for _ in range(n):
            cat = int(rng.randint(1, len(CATEGORIES) + 1))
            # object sizes adapt to small canvases (w//2 <= 30 would make
            # randint(30, w//2) raise); the floor is capped at w//2 so
            # bw < w always holds and the position draw below stays valid
            lo_w = max(2, min(30, w // 4, w // 2 - 1))
            lo_h = max(2, min(30, h // 4, h // 2 - 1))
            u = rng.rand()
            if small_frac and u < small_frac:
                # COCO-small instance: both sides < 32 px (area < 32²)
                bw = int(rng.randint(10, min(32, w // 2)))
                bh = int(rng.randint(10, min(32, h // 2)))
            elif medium_frac and u < small_frac + medium_frac:
                # COCO-medium: sides 34-90 px keep 32² <= area < 96²
                bw = int(rng.randint(34, min(91, w // 2)))
                bh = int(rng.randint(34, min(91, h // 2)))
            else:
                bw = int(rng.randint(lo_w, max(w // 2, lo_w + 1)))
                bh = int(rng.randint(lo_h, max(h // 2, lo_h + 1)))
            x0 = int(rng.randint(0, max(w - bw, 1)))
            y0 = int(rng.randint(0, max(h - bh, 1)))
            color = rng.randint(90, 255, 3)
            if cat == 1:      # filled rectangle
                canvas[y0:y0 + bh, x0:x0 + bw] = color
                poly = [x0, y0, x0 + bw - 1, y0, x0 + bw - 1, y0 + bh - 1,
                        x0, y0 + bh - 1]
            elif cat == 2:    # ellipse
                yy, xx = np.mgrid[0:h, 0:w]
                cy, cx = y0 + bh / 2, x0 + bw / 2
                m = (((xx - cx) / (bw / 2)) ** 2
                     + ((yy - cy) / (bh / 2)) ** 2) <= 1
                canvas[m] = color
                t = np.linspace(0, 2 * np.pi, 24, endpoint=False)
                poly = np.stack([cx + (bw / 2 - 0.5) * np.cos(t),
                                 cy + (bh / 2 - 0.5) * np.sin(t)],
                                1).reshape(-1).tolist()
            else:             # thin stripe
                # clamp to the canvas: y0 was drawn against the ORIGINAL bh,
                # so raising bh to the 12-row floor could push the recorded
                # bbox/polygon past the bottom edge on small canvases
                bh = min(max(12, bh // 3), h - y0)
                canvas[y0:y0 + bh, x0:x0 + bw] = color
                poly = [x0, y0, x0 + bw - 1, y0, x0 + bw - 1, y0 + bh - 1,
                        x0, y0 + bh - 1]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [list(map(float, poly))],
            })
            ann_id += 1
        fname = f"synthetic_{img_id:06d}.png"
        Image.fromarray(canvas).save(os.path.join(img_dir, fname))
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})

    ann_path = os.path.join(ann_dir, f"instances_{split}{year}.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": CATEGORIES}, f)
    return ann_path


# ---------------------------------------------------------------------------
# Held-out generalization benchmark (8 classes, skewed small-object mix)
# ---------------------------------------------------------------------------
def _shape_mask(name: str, h: int, w: int, x0: int, y0: int,
                bw: int, bh: int) -> "np.ndarray":
    """Boolean [h, w] mask for one instance of class ``name``."""
    yy, xx = np.mgrid[0:h, 0:w]
    in_box = (xx >= x0) & (xx < x0 + bw) & (yy >= y0) & (yy < y0 + bh)
    cy, cx = y0 + bh / 2.0, x0 + bw / 2.0
    ry, rx = max(bh / 2.0, 1.0), max(bw / 2.0, 1.0)
    ell = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    if name == "box":
        return in_box
    if name == "disk":
        return ell <= 1.0
    if name == "stripe":
        t = max(2, bh // 4)
        return in_box & (yy >= cy - t / 2.0) & (yy < cy + t / 2.0)
    if name == "triangle":
        return in_box & ((xx - x0) / max(bw, 1)
                         + (yy - y0) / max(bh, 1) <= 1.0)
    if name == "ring":
        inner = (((xx - cx) / (rx * 0.55)) ** 2
                 + ((yy - cy) / (ry * 0.55)) ** 2)
        return (ell <= 1.0) & (inner > 1.0)
    if name == "cross":
        tv, th = max(2, bw // 3), max(2, bh // 3)
        vert = in_box & (xx >= cx - tv / 2.0) & (xx < cx + tv / 2.0)
        horz = in_box & (yy >= cy - th / 2.0) & (yy < cy + th / 2.0)
        return vert | horz
    if name == "diamond":
        return (np.abs(xx - cx) / rx + np.abs(yy - cy) / ry) <= 1.0
    if name == "checker":
        cell_w, cell_h = max(2, bw // 4), max(2, bh // 4)
        par = ((xx - x0) // cell_w + (yy - y0) // cell_h) % 2 == 0
        return in_box & par
    raise ValueError(name)


def _box_iou(a, b) -> float:
    y1 = max(a[0], b[0]); x1 = max(a[1], b[1])
    y2 = min(a[2], b[2]); x2 = min(a[3], b[3])
    inter = max(y2 - y1, 0) * max(x2 - x1, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
          - inter)
    return inter / max(ua, 1e-9)


def generate_rich(root: str, num_images: int,
                  size: Tuple[int, int] = (320, 320),
                  year: str = "2014", split: str = "minival",
                  seed: int = 0, num_classes: int = 8,
                  small_frac: float = 0.55,
                  min_instances: int = 2, max_instances: int = 6,
                  color_mode: str = "class") -> str:
    """Write a shape-classification benchmark split; returns the ann path.

    ``small_frac`` of instances are drawn with COCO-'small' footprint
    (mask area < 32² px — the AP_small band the intertwiner targets,
    README.md:69 AP_small column); the rest are large (reliable-set fodder).
    Instances avoid heavy overlap (IoU ≤ 0.25) so the GT is unambiguous.
    ``split='train'`` writes images under ``train<year>/`` matching
    ``get_data``'s directory convention; anything else under ``val<year>/``.
    Segmentations are exact RLEs of the drawn masks.

    ``color_mode``:
      'class'  — one base color per class (default): identity is cued by
                 appearance AND shape, so small instances stay classifiable
                 and the task is learnable from scratch.
      'paired' — classes 2k-1 and 2k SHARE a color family and differ only
                 in geometry. Color carries a class PAIR; resolving within
                 the pair needs shape, which small (10-30 px) instances
                 barely render — the low-resolution-unreliability premise
                 the Feature Intertwiner targets (paper §1; the reliable
                 big set of a class should disambiguate its small set).
    """
    from ..evaluation.rle import RLE

    rng = np.random.RandomState(seed)
    h, w = size
    cats = RICH_CATEGORIES[:num_classes]
    dir_name = f"train{year}" if split == "train" else f"val{year}"
    img_dir = os.path.join(root, dir_name)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        canvas = rng.randint(0, 60, (h, w, 3)).astype(np.uint8)
        placed = []
        n = rng.randint(min_instances, max_instances + 1)
        for _ in range(n):
            cat = int(rng.randint(1, len(cats) + 1))
            name = cats[cat - 1]["name"]
            if rng.rand() < small_frac:
                bw = int(rng.randint(10, 30))
                bh = int(rng.randint(10, min(29, max(11, 1300 // bw))))
            else:
                hi_w = max(50, min(w // 2, 170))
                hi_h = max(50, min(h // 2, 170))
                bw = int(rng.randint(48, hi_w + 1))
                bh = int(rng.randint(48, hi_h + 1))
            box = None
            for _try in range(12):
                x0 = int(rng.randint(0, max(w - bw, 1)))
                y0 = int(rng.randint(0, max(h - bh, 1)))
                cand = (y0, x0, y0 + bh, x0 + bw)
                if all(_box_iou(cand, p) <= 0.25 for p in placed):
                    box = cand
                    break
            if box is None:
                continue
            placed.append(box)
            mask = _shape_mask(name, h, w, x0, y0, bw, bh)
            area = int(mask.sum())
            if area < 8:
                continue
            color_id = cat - 1 if color_mode == "class" \
                else ((cat - 1) // 2) * 2
            color = np.clip(RICH_COLORS[color_id]
                            + rng.randint(-40, 41, 3), 25, 255)
            canvas[mask] = color
            ys, xs = np.nonzero(mask)
            bx0, by0 = int(xs.min()), int(ys.min())
            bx1, by1 = int(xs.max()) + 1, int(ys.max()) + 1
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [float(bx0), float(by0), float(bx1 - bx0),
                         float(by1 - by0)],
                "area": float(area), "iscrowd": 0,
                "segmentation": RLE.encode(mask).to_coco(),
            })
            ann_id += 1
        fname = f"rich_{split}_{img_id:06d}.png"
        Image.fromarray(canvas).save(os.path.join(img_dir, fname))
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})

    ann_path = os.path.join(ann_dir, f"instances_{split}{year}.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    return ann_path
