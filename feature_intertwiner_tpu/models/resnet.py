"""ResNet-50/101 backbone (stages C1–C5) in flax, NHWC.

Capability parity with ``/root/reference/lib/sub_module.py:38-128``: caffe
style bottlenecks (stride on the 1×1 ``conv1``), BN eps 1e-3, stage widths
64/128/256/512 with expansion 4, depths [3,4,6,3] (R50) / [3,4,23,3] (R101).
Stages are exposed individually so FPN can tap C2–C5 and the stage-wise
training schedule ("heads" → "4+" → "all") can freeze by path prefix.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import BN, conv

STAGE_DEPTHS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    has_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        residual = x
        y = conv(self.filters, 1, strides=self.stride, padding="VALID",
                 name="conv1", dtype=self.dtype)(x)
        y = BN(dtype=self.dtype, name="bn1")(y, train_bn)
        y = nn.relu(y)
        y = conv(self.filters, 3, name="conv2", dtype=self.dtype)(y)
        y = BN(dtype=self.dtype, name="bn2")(y, train_bn)
        y = nn.relu(y)
        y = conv(self.filters * 4, 1, padding="VALID", name="conv3",
                 dtype=self.dtype)(y)
        y = BN(dtype=self.dtype, name="bn3")(y, train_bn)
        if self.has_projection:
            residual = conv(self.filters * 4, 1, strides=self.stride,
                            padding="VALID", name="proj_conv", dtype=self.dtype)(x)
            residual = BN(dtype=self.dtype, name="proj_bn")(residual, train_bn)
        return nn.relu(y + residual)


class Stage(nn.Module):
    filters: int
    blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        x = Bottleneck(self.filters, self.stride, has_projection=True,
                       dtype=self.dtype, name="block0")(x, train_bn)
        for i in range(1, self.blocks):
            x = Bottleneck(self.filters, dtype=self.dtype,
                           name=f"block{i}")(x, train_bn)
        return x


class ResNet(nn.Module):
    """Returns (c2, c3, c4, c5) feature maps at strides 4/8/16/32.

    ``remat=True`` checkpoints each stage (jax.checkpoint): activations are
    recomputed in the backward pass, trading ~⅓ extra backbone FLOPs for the
    memory to fit larger train batches (SURVEY.md §7 / TPU.REMAT_BACKBONE).
    """

    architecture: str = "resnet101"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train_bn: bool = False) -> Tuple:
        depths = STAGE_DEPTHS[self.architecture]
        stage_cls = (nn.remat(Stage, static_argnums=(2,)) if self.remat
                     else Stage)
        # C1 stem: 7x7/2 with torch-style pad 3, BN, ReLU, SAME 3x3/2 maxpool.
        x = conv(64, 7, strides=2, padding=((3, 3), (3, 3)), name="c1_conv",
                 dtype=self.dtype)(images)
        x = BN(dtype=self.dtype, name="c1_bn")(x, train_bn)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        c2 = stage_cls(64, depths[0], stride=1, dtype=self.dtype, name="c2")(x, train_bn)
        c3 = stage_cls(128, depths[1], stride=2, dtype=self.dtype, name="c3")(c2, train_bn)
        c4 = stage_cls(256, depths[2], stride=2, dtype=self.dtype, name="c4")(c3, train_bn)
        c5 = stage_cls(512, depths[3], stride=2, dtype=self.dtype, name="c5")(c4, train_bn)
        return c2, c3, c4, c5
