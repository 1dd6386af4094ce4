"""Second-stage heads: box classifier/regressor and mask branch.

Capability parity with ``Classifier`` (/root/reference/lib/sub_module.py:698-747)
and ``Mask`` (:750-787). The classifier's optional CLS_MERGE_FEAT mixes the
intertwiner's 1024-d small-set features into the head. NOTE: the reference
adds ``small_output_all`` rows in *level-processing order* to head features in
*RoI order* — a misalignment (SURVEY.md §2.1 Dev notes); here the small
features arrive already scattered back to RoI order, implementing the intent.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import BN, conv, deconv, dense


class BoxHead(nn.Module):
    """Pooled [N, P, P, C] -> class logits [N, K], bbox deltas [N, K, 4],
    and the 1024-d penultimate feature (for CLS_MERGE / visualize phase)."""

    num_classes: int
    pool_size: int = 7
    merge_feat: bool = False
    merge_manner: str = "simple_add"   # 'simple_add' | 'linear_add'
    merge_fac: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pooled: jax.Array,
        small_feat: Optional[jax.Array] = None,
        small_gt: Optional[jax.Array] = None,
        train_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        n = pooled.shape[0]
        # conv with kernel == pool size, VALID: the FC-as-conv of the reference
        x = conv(1024, self.pool_size, padding="VALID", name="fc1",
                 dtype=self.dtype)(pooled)                       # [N,1,1,1024]
        x = BN(dtype=self.dtype, name="bn1")(x, train_bn)
        x = nn.relu(x)

        if self.merge_feat and small_feat is not None:
            gate = (small_gt > 0).astype(x.dtype)[:, None]       # [N,1]
            sf = (small_feat * gate).reshape(n, 1, 1, -1)
            if self.merge_manner == "simple_add":
                x = x + sf
            elif self.merge_manner == "linear_add":
                w = gate.reshape(n, 1, 1, 1) * self.merge_fac
                x = (1.0 - w) * x + w * small_feat.reshape(n, 1, 1, -1)
            else:
                raise ValueError(self.merge_manner)

        x = conv(1024, 1, padding="VALID", name="fc2", dtype=self.dtype)(x)
        x = BN(dtype=self.dtype, name="bn2")(x, train_bn)
        x = nn.relu(x)
        feat = x.reshape(n, 1024)

        logits = dense(self.num_classes, name="linear_class",
                       dtype=self.dtype)(feat).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        bbox = dense(self.num_classes * 4, name="linear_bbox",
                     dtype=self.dtype)(feat)
        bbox = bbox.reshape(n, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, bbox, feat.astype(jnp.float32)


class MaskHead(nn.Module):
    """Pooled [N, 14, 14, C] -> per-class masks [N, 28, 28, K] (sigmoid)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False) -> jax.Array:
        for i in range(1, 5):
            x = conv(256, 3, name=f"conv{i}", dtype=self.dtype)(x)
            # eps=0.001 but DEFAULT torch momentum (sub_module.py:757-763)
            x = BN(dtype=self.dtype, momentum=0.9, name=f"bn{i}")(x, train_bn)
            x = nn.relu(x)
        x = deconv(256, 2, strides=2, name="upsample", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = conv(self.num_classes, 1, padding="VALID", name="logits",
                 dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))
