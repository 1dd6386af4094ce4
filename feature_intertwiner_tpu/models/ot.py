"""OptTrans: learned generator + critic around the Sinkhorn OT divergence.

Capability parity with ``/root/reference/lib/OT_module.py:7-102``:

- ``G_net`` maps the less-reliable ("small") features into the reliable
  ("big") feature space — 2D: ConvTranspose 3×3 (stride 2 when upsampling,
  1 otherwise) + BN + ReLU; 1D: Conv k3 + ReLU;
- ``critic`` embeds both sets before the OT cost — 2D: two stride-2 convs
  halving/quartering channels; 1D: Conv k3 to ch/4 ('conv' form) or a Dense
  to ch/8 ('fc' form);
- loss is the debiased divergence ``2·OT(x̂,y) − OT(x̂,x̂) − OT(y,y)`` with
  the plan detached (see ops/sinkhorn.py).

Used (a) as the intertwiner meta-loss over per-class 1024-d vectors
(lib/model.py:66-67,206-207) and (b) as the FPN inter-level loss on adjacent
pyramid maps (lib/sub_module.py:179-213).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sinkhorn import sinkhorn_divergence
from .common import BN, conv, deconv


class OptTrans2D(nn.Module):
    """OT loss between two NHWC maps; x may be spatially smaller than y."""

    channels: int
    upsample: bool          # True when x's spatial size is half of y's
    epsilon: float = 1.0
    iters: int = 5
    cost_form: str = "cosine"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, train_bn: bool = False) -> jax.Array:
        ch = self.channels
        xh = deconv(ch, 3, strides=2 if self.upsample else 1, name="g_deconv",
                    dtype=self.dtype)(x)
        xh = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
                name="g_bn")(xh, train_bn)
        xh = nn.relu(xh)

        # shared critic modules applied to both sets (OT_module.py:95-98)
        c1 = conv(ch // 2, 3, strides=2, name="critic_conv1", dtype=self.dtype)
        b1 = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
                name="critic_bn1")
        c2 = conv(ch // 4, 3, strides=2, name="critic_conv2", dtype=self.dtype)
        b2 = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
                name="critic_bn2")

        def critic(z):
            z = nn.relu(b1(c1(z), train_bn))
            return nn.relu(b2(c2(z), train_bn))

        cx = critic(xh)
        cy = critic(y)
        b = cx.shape[0]
        # rows = channels, feature dim = flattened spatial (OT_module.py:95-98)
        cx = cx.reshape(b, -1, cx.shape[-1]).transpose(0, 2, 1)
        cy = cy.reshape(b, -1, cy.shape[-1]).transpose(0, 2, 1)
        return sinkhorn_divergence(
            cx.astype(jnp.float32), cy.astype(jnp.float32),
            epsilon=self.epsilon, iters=self.iters, cost_form=self.cost_form,
        )


class OptTrans1D(nn.Module):
    """OT loss between two sets of feature vectors [n, ch] (meta-loss form)."""

    channels: int
    one_dim_form: str = "conv"   # 'conv' | 'fc'
    epsilon: float = 1.0
    iters: int = 5
    cost_form: str = "cosine"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, row_weights: jax.Array = None) -> jax.Array:
        """x, y: [n, ch] (SMALL and BIG per-class vectors). Returns scalar.

        The reference feeds [n, ch, 1] NCL tensors; NHWC-style here the
        length-1 axis is spatial and ch are the conv features. The per-sample
        OT then runs over the critic's ch//4 output channels as rows of
        dimension 1 (OT_module.py:95-101).

        ``row_weights`` [n] masks out padded (invalid-class) samples: their
        per-sample OT losses are excluded from the sum — the static-shape
        equivalent of the reference's dynamic class selection.
        """
        # Conv1d(ch→ch, k3, pad 1) over a length-1 axis: with zero padding
        # only the center tap sees data (OT_module.py:37-41). The critic is
        # a single shared module applied to both sets.
        g_conv = nn.Conv(self.channels, (3,), padding="SAME", name="g_conv",
                         dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform())
        if self.one_dim_form == "conv":
            critic_mod = nn.Conv(self.channels // 4, (3,), padding="SAME",
                                 name="critic_conv", dtype=self.dtype,
                                 kernel_init=nn.initializers.xavier_uniform())
            critic = lambda z: nn.relu(critic_mod(z))   # noqa: E731
        else:
            critic_mod = nn.Dense(self.channels // 8, name="critic_fc",
                                  dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01))
            critic = critic_mod

        xg = nn.relu(g_conv(x[:, None, :]))            # [n, 1, ch]
        cx = critic(xg)                                # [n, 1, ch//4 or //8]
        cy = critic(y[:, None, :])
        cx = cx.transpose(0, 2, 1)                     # [n, ch', 1]
        cy = cy.transpose(0, 2, 1)
        per_sample = sinkhorn_divergence(
            cx.astype(jnp.float32), cy.astype(jnp.float32),
            epsilon=self.epsilon, iters=self.iters, cost_form=self.cost_form,
        )
        if row_weights is not None:
            per_sample = per_sample * row_weights.astype(per_sample.dtype)
        return jnp.sum(per_sample)
