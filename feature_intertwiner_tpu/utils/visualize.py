"""Visualization: instance rendering + training curves.

Capability parity with ``/root/reference/tools/visualize.py``:
``display_instances`` (:68-137) renders detections (boxes, labels, optional
masks) to a matplotlib figure / PNG; the visdom ``Visualizer`` dashboards
(:408-553) become :func:`plot_loss_curves` over the JSONL metrics stream
(utils/logging.py) — loss curves, config dump, and mAP history as files
under the run's result folder.
"""

from __future__ import annotations

import colorsys
import os
import random
from typing import List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import patches  # noqa: E402


def random_colors(n: int, bright: bool = True) -> List[tuple]:
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    random.shuffle(colors)
    return colors


def apply_mask(image: np.ndarray, mask: np.ndarray, color, alpha=0.5):
    for c in range(3):
        image[:, :, c] = np.where(
            mask == 1,
            image[:, :, c] * (1 - alpha) + alpha * color[c] * 255,
            image[:, :, c])
    return image


def display_instances(image, boxes, class_ids, class_names, scores=None,
                      masks=None, title: str = "",
                      save_path: Optional[str] = None, figsize=(12, 12)):
    """boxes [N,(y1,x1,y2,x2)] pixels; class_ids [N]; masks [N,H,W] optional."""
    n = len(boxes)
    colors = random_colors(max(n, 1))
    fig, ax = plt.subplots(1, figsize=figsize)
    canvas = image.astype(np.float32).copy()
    for i in range(n):
        color = colors[i % len(colors)]
        y1, x1, y2, x2 = boxes[i]
        ax.add_patch(patches.Rectangle(
            (x1, y1), x2 - x1, y2 - y1, linewidth=2, alpha=0.7,
            edgecolor=color, facecolor="none"))
        label = class_names[int(class_ids[i])] if class_names else str(
            int(class_ids[i]))
        caption = (f"{label} {scores[i]:.3f}" if scores is not None
                   else label)
        ax.text(x1, max(y1 - 2, 0), caption, color="w", size=11,
                backgroundcolor="none")
        if masks is not None:
            canvas = apply_mask(canvas, masks[i], color)
    ax.imshow(canvas.astype(np.uint8))
    ax.set_title(title)
    ax.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig


def plot_loss_curves(metrics: Sequence[dict], save_path: str,
                     keys: Optional[Sequence[str]] = None):
    """Loss curves from the JSONL metrics stream (visdom panel stand-in)."""
    if not metrics:
        return None
    keys = keys or [k for k in metrics[0]
                    if k.endswith("_loss") or k == "total_loss"]
    fig, ax = plt.subplots(1, figsize=(10, 6))
    xs = np.arange(len(metrics))
    for k in keys:
        ys = [m.get(k, np.nan) for m in metrics]
        ax.plot(xs, ys, label=k)
    ax.set_xlabel("logged step")
    ax.set_ylabel("loss")
    ax.legend(loc="upper right", fontsize=8)
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path
