"""Host-side image/mask preprocessing for fixed-shape TPU batches.

Capability parity with ``/root/reference/tools/image_utils.py``:

- :func:`resize_image` — aspect-preserving resize (smallest side ≥ min_dim,
  longest ≤ max_dim, never downscale below scale 1) + center zero-pad to
  max_dim² (:69-119);
- :func:`resize_mask` / :func:`minimize_mask` / :func:`expand_mask` /
  :func:`unmold_mask` — instance-mask resizing, 56² mini-masks thresholded at
  half-intensity, eval-time back-projection (:122-189);
- :func:`compose_image_meta` / :func:`parse_image_meta` — the packed per-image
  metadata row (:8-40);
- :func:`load_image_and_gt` — the full per-image train-time pipeline:
  resize, pad, random horizontal flip, bbox-from-mask, mini-masks (:195-246).

Resize interpolation uses cv2 bilinear (the reference's deprecated
``scipy.misc.imresize`` was PIL bilinear on uint8 — equal up to rounding;
mask resize uses bilinear + 0.5 threshold matching the reference's
``>= 128`` on the 0-255 rescale).
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


def compose_image_meta(image_id, image_shape, window, active_class_ids,
                       coco_image_id) -> np.ndarray:
    return np.array(
        [image_id] + list(image_shape) + list(window)
        + list(active_class_ids) + [coco_image_id], dtype=np.float32)


def parse_image_meta(meta: np.ndarray):
    """[B, L] -> (image_id, image_shape, window, active_class_ids, coco_id)."""
    return (meta[:, 0], meta[:, 1:4], meta[:, 4:8], meta[:, 8:-1],
            meta[:, -1])


def resize_image(image: np.ndarray, min_dim: Optional[int] = None,
                 max_dim: Optional[int] = None, padding: bool = True):
    """Returns (image, window (y1,x1,y2,x2), scale, padding_spec)."""
    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1.0
    if min_dim:
        scale = max(1.0, min_dim / min(h, w))
    if max_dim and round(max(h, w) * scale) > max_dim:
        scale = max_dim / max(h, w)
    if scale != 1.0:
        image = cv2.resize(image, (round(w * scale), round(h * scale)),
                           interpolation=cv2.INTER_LINEAR)
    pad_spec = [(0, 0), (0, 0), (0, 0)]
    if padding:
        h2, w2 = image.shape[:2]
        top = (max_dim - h2) // 2
        bottom = max_dim - h2 - top
        left = (max_dim - w2) // 2
        right = max_dim - w2 - left
        pad_spec = [(top, bottom), (left, right), (0, 0)]
        image = np.pad(image, pad_spec[:image.ndim], mode="constant")
        window = (top, left, h2 + top, w2 + left)
    return image, window, scale, pad_spec


def resize_mask(mask: np.ndarray, scale: float, pad_spec) -> np.ndarray:
    """mask [H, W, N] -> resized+padded (bool)."""
    if scale != 1.0:
        h, w = mask.shape[:2]
        if mask.size:
            out = cv2.resize(mask.astype(np.float32),
                             (round(w * scale), round(h * scale)),
                             interpolation=cv2.INTER_LINEAR)
            if out.ndim == 2:
                out = out[:, :, None]
            mask = out >= 0.5
        else:
            # N=0: still rescale the canvas so shape[:2] tracks the image
            mask = np.zeros((round(h * scale), round(w * scale),
                             mask.shape[-1]), bool)
    mask = np.pad(mask, pad_spec[:mask.ndim], mode="constant")
    return mask.astype(bool)


def extract_bboxes(mask: np.ndarray) -> np.ndarray:
    """[H, W, N] -> [N, (y1,x1,y2,x2)] tight int boxes (exclusive +1)."""
    n = mask.shape[-1]
    boxes = np.zeros((n, 4), np.int32)
    for i in range(n):
        m = mask[:, :, i]
        xs = np.where(m.any(axis=0))[0]
        ys = np.where(m.any(axis=1))[0]
        if len(xs):
            boxes[i] = [ys[0], xs[0], ys[-1] + 1, xs[-1] + 1]
    return boxes


def minimize_mask(bbox: np.ndarray, mask: np.ndarray,
                  mini_shape: Tuple[int, int]) -> np.ndarray:
    """Crop each instance to its box and resize to mini_shape (bool)."""
    n = mask.shape[-1]
    mini = np.zeros(tuple(mini_shape) + (n,), bool)
    for i in range(n):
        y1, x1, y2, x2 = bbox[i][:4]
        m = mask[y1:y2, x1:x2, i]
        if m.size == 0:
            continue
        r = cv2.resize(m.astype(np.float32), (mini_shape[1], mini_shape[0]),
                       interpolation=cv2.INTER_LINEAR)
        mini[:, :, i] = r >= 0.5
    return mini


def expand_mask(bbox: np.ndarray, mini_mask: np.ndarray,
                image_shape: Tuple[int, int]) -> np.ndarray:
    """Inverse of minimize_mask (debug/visualization utility)."""
    n = mini_mask.shape[-1]
    mask = np.zeros(tuple(image_shape[:2]) + (n,), bool)
    for i in range(n):
        y1, x1, y2, x2 = bbox[i][:4]
        h, w = y2 - y1, x2 - x1
        if h <= 0 or w <= 0:
            continue
        r = cv2.resize(mini_mask[:, :, i].astype(np.float32), (w, h),
                       interpolation=cv2.INTER_LINEAR)
        mask[y1:y2, x1:x2, i] = r >= 0.5
    return mask


def unmold_mask(mask: np.ndarray, bbox, image_shape) -> np.ndarray:
    """28² float mask + pixel box -> full-size binary mask (parity :172-189)."""
    y1, x1, y2, x2 = [int(v) for v in bbox]
    h, w = max(y2 - y1, 1), max(x2 - x1, 1)
    m = cv2.resize(mask.astype(np.float32), (w, h),
                   interpolation=cv2.INTER_LINEAR)
    m = (m >= 0.5).astype(np.uint8)
    full = np.zeros(image_shape[:2], np.uint8)
    y2c, x2c = min(y1 + h, image_shape[0]), min(x1 + w, image_shape[1])
    if y1 < y2c and x1 < x2c:
        full[y1:y2c, x1:x2c] = m[: y2c - y1, : x2c - x1]
    return full


def load_image_and_gt(dataset, config, image_id: int, augment: bool = False,
                      use_mini_mask: bool = False,
                      rng: Optional[np.random.RandomState] = None):
    """Full per-image training pipeline (parity :195-246)."""
    rng = rng or np.random
    image = dataset.load_image(image_id)
    mask, class_ids = dataset.load_mask(image_id)
    min_dim = config.DATA.IMAGE_MIN_DIM
    scales = list(config.DATA.get("MULTISCALE_MIN_DIMS", []) or [])
    if augment and scales:
        min_dim = int(scales[rng.randint(0, len(scales))])
    image, window, scale, pad_spec = resize_image(
        image, min_dim=min_dim,
        max_dim=config.DATA.IMAGE_MAX_DIM, padding=config.DATA.IMAGE_PADDING)
    mask = resize_mask(mask, scale, pad_spec)

    if augment and rng.randint(0, 2):
        image = np.fliplr(image)
        mask = np.fliplr(mask)

    bbox = extract_bboxes(mask)

    active_class_ids = np.zeros([dataset.num_classes], np.int32)
    source_ids = dataset.source_class_ids[
        dataset.image_info[image_id]["source"]]
    active_class_ids[source_ids] = 1

    if use_mini_mask:
        mask = minimize_mask(bbox, mask, tuple(config.MRCNN.MINI_MASK_SHAPE))

    coco_image_id = dataset.image_info[image_id]["id"]
    meta = compose_image_meta(image_id, image.shape, window,
                              active_class_ids, coco_image_id)
    return image, meta, class_ids, bbox, mask
