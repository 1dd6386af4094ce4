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


def generate(root: str, num_images: int = 8, size: Tuple[int, int] = (240, 320),
             year: str = "2014", split: str = "minival", seed: int = 0,
             max_instances: int = 4) -> str:
    """Write a synthetic dataset; returns the annotation json path."""
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
                bh = max(12, bh // 3)
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
