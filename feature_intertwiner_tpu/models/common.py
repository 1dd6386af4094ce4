"""Shared building blocks for the flax model stack.

Layout is NHWC (TPU-native; the reference is NCHW torch). Padding notes:

- the reference wraps 3×3 convs in a TF-"SAME" shim (``SamePad2d``,
  /root/reference/lib/sub_module.py:9-32) — flax ``padding='SAME'`` is the
  same semantics natively;
- the C1 stem conv uses torch-style symmetric padding 3 (sub_module.py:89),
  which differs from SAME by a one-pixel shift on even inputs — kept explicit.

BatchNorm parity: eps=1e-3, torch momentum 0.01 ⇒ flax momentum 0.99
(sub_module.py:44-49). The reference effectively always runs BN in eval mode
during training (TRAIN.BN_LEARN=False + the mode quirk, SURVEY.md §3.5 #1),
so ``use_running_average`` defaults True; set ``train_bn=True`` to learn
statistics (the BN_LEARN=True capability).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BN(nn.Module):
    """BatchNorm with the reference's per-site hyperparameters.

    Defaults match the backbone/classifier convention
    (``nn.BatchNorm2d(..., eps=0.001, momentum=0.01)``,
    sub_module.py:44-120,708-711; torch momentum m ≡ flax 1−m). The Dev
    upsampler/critic and OT-module BNs are built with torch DEFAULTS
    (eps=1e-5, momentum=0.1 → flax 0.9, sub_module.py:322,334-340,
    OT_module.py:32-52) and the mask head mixes the two
    (eps=0.001, default momentum, sub_module.py:757-763) — call sites pass
    the overrides."""

    dtype: Dtype = jnp.float32
    epsilon: float = 1e-3
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        return nn.BatchNorm(
            use_running_average=not train_bn,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)


def conv(features: int, kernel, strides=1, padding="SAME", name=None,
         dtype: Dtype = jnp.float32, use_bias: bool = True,
         kernel_init=None) -> nn.Conv:
    """Conv with Xavier-uniform init (parity: lib/model.py:86-94)."""
    return nn.Conv(
        features,
        kernel if isinstance(kernel, (tuple, list)) else (kernel, kernel),
        strides=strides if isinstance(strides, (tuple, list)) else (strides, strides),
        padding=padding,
        name=name,
        dtype=dtype,
        use_bias=use_bias,
        kernel_init=kernel_init or nn.initializers.xavier_uniform(),
    )


def deconv(features: int, kernel, strides, name=None, dtype: Dtype = jnp.float32) -> nn.ConvTranspose:
    """ConvTranspose with Xavier-normal init (lib/model.py:95-98)."""
    return nn.ConvTranspose(
        features,
        kernel if isinstance(kernel, (tuple, list)) else (kernel, kernel),
        strides=strides if isinstance(strides, (tuple, list)) else (strides, strides),
        padding="SAME",
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.xavier_normal(),
    )


def dense(features: int, name=None, dtype: Dtype = jnp.float32) -> nn.Dense:
    """Dense with N(0, 0.01) init (lib/model.py:102-104)."""
    return nn.Dense(
        features,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.normal(0.01),
    )
