"""Region Proposal Network head, shared across FPN levels.

Capability parity with ``/root/reference/lib/sub_module.py:234-280``: shared
3×3/512 conv + ReLU, 1×1 class (2 per anchor) and 1×1 bbox (4 per anchor)
branches. NHWC reshape [B,H,W,2A] → [B, H·W·A, 2] preserves the reference's
anchor ordering (cells row-major, anchor index fastest — matches
ops/anchors.py).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import conv


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        b = x.shape[0]
        a = self.anchors_per_location
        shared = nn.relu(
            conv(512, 3, strides=self.anchor_stride, name="shared",
                 dtype=self.dtype)(x)
        )
        logits = conv(2 * a, 1, padding="VALID", name="cls", dtype=self.dtype)(shared)
        logits = logits.reshape(b, -1, 2)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        bbox = conv(4 * a, 1, padding="VALID", name="bbox", dtype=self.dtype)(shared)
        bbox = bbox.reshape(b, -1, 4)
        return logits, probs, bbox


def run_rpn_over_pyramid(rpn: RPNHead, feature_maps: List[jax.Array]):
    """Apply the shared head per level and concat along the anchor axis
    (parity: lib/model.py:288-299)."""
    outs = [rpn(p) for p in feature_maps]
    logits = jnp.concatenate([o[0] for o in outs], axis=1)
    probs = jnp.concatenate([o[1] for o in outs], axis=1)
    bbox = jnp.concatenate([o[2] for o in outs], axis=1)
    return logits, probs, bbox
