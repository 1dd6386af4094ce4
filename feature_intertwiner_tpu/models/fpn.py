"""Feature Pyramid Network head over ResNet C2–C5, NHWC.

Capability parity with ``/root/reference/lib/sub_module.py:147-228``:
1×1 laterals, nearest 2× top-down merge, 3×3 output smoothing, P6 via
stride-2 subsample of P5, optional inter-level OT loss on adjacent laterals
before the merge (train only; sub_module.py:179-213).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import conv
from .ot import OptTrans2D


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,2H,2W,C] nearest (parity: F.upsample default mode)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    out_channels: int = 256
    fpn_ot_loss: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, c2, c3, c4, c5, train: bool = False, train_bn: bool = False
    ) -> Tuple[List[jax.Array], jax.Array]:
        """Returns ([p2, p3, p4, p5, p6], ot_loss [B, 3])."""
        ch = self.out_channels
        p5 = conv(ch, 1, padding="VALID", name="p5_lateral", dtype=self.dtype)(c5)
        l4 = conv(ch, 1, padding="VALID", name="p4_lateral", dtype=self.dtype)(c4)
        l3 = conv(ch, 1, padding="VALID", name="p3_lateral", dtype=self.dtype)(c3)
        l2 = conv(ch, 1, padding="VALID", name="p2_lateral", dtype=self.dtype)(c2)

        ot = jnp.zeros((c2.shape[0], 3), jnp.float32)
        # Call OT modules during init even in eval so the param tree is stable
        # across train/inference variants.
        use_ot = self.fpn_ot_loss and (train or self.is_initializing())
        if self.fpn_ot_loss:
            p4_ot = OptTrans2D(ch, upsample=True, name="p4_ot", dtype=self.dtype)
            p3_ot = OptTrans2D(ch, upsample=True, name="p3_ot", dtype=self.dtype)
            p2_ot = OptTrans2D(ch, upsample=True, name="p2_ot", dtype=self.dtype)

        if use_ot:
            ot = ot.at[:, 0].set(p4_ot(p5, l4, train_bn))
        p4 = l4 + upsample2x_nearest(p5)
        if use_ot:
            ot = ot.at[:, 1].set(p3_ot(p4, l3, train_bn))
        p3 = l3 + upsample2x_nearest(p4)
        if use_ot:
            ot = ot.at[:, 2].set(p2_ot(p3, l2, train_bn))
        p2 = l2 + upsample2x_nearest(p3)

        p5 = conv(ch, 3, name="p5_out", dtype=self.dtype)(p5)
        p4 = conv(ch, 3, name="p4_out", dtype=self.dtype)(p4)
        p3 = conv(ch, 3, name="p3_out", dtype=self.dtype)(p3)
        p2 = conv(ch, 3, name="p2_out", dtype=self.dtype)(p2)
        # P6: stride-2 subsample of P5 (MaxPool k1 s2, sub_module.py:157)
        p6 = p5[:, ::2, ::2, :]
        return [p2, p3, p4, p5, p6], ot
