"""True in-graph cost of the actual rpn_targets/detection_targets functions
(scan-repeated, single dispatch), plus an iou-passes decomposition.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops import boxes as box_ops
from feature_intertwiner_tpu.ops.targets import rpn_targets, detection_targets

B, A, G, P = 8, 261888, 100, 1000
REPS = int(os.environ.get("REPS", "10"))


from _bench import scan_time as _scan_time


def scan_time(name, body):
    return _scan_time(name, body, reps=REPS)


def main():
    rng = np.random.RandomState(0)
    anchors = jnp.array(rng.uniform(0, 1024, (A, 4)).astype(np.float32))
    gt = jnp.array(rng.uniform(0, 1024, (B, G, 4)).astype(np.float32))
    cls = jnp.array(rng.randint(1, 81, (B, G)).astype(np.int32))
    masks = jnp.array((rng.rand(B, G, 56, 56) > .5).astype(np.float32))
    props = jnp.array(rng.uniform(0, 1, (B, P, 4)).astype(np.float32))
    std = jnp.array([0.1, 0.1, 0.2, 0.2], jnp.float32)

    scan_time("floor", lambda c, i: c + 1.0)

    def rpn_body(c, i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        t = rpn_targets(k, anchors, cls, gt + c * 1e-9, std)
        return c + jnp.sum(t.match).astype(jnp.float32) * 1e-9
    scan_time("rpn_targets (full)", rpn_body)

    def det_body(c, i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        t = detection_targets(k, props + c * 1e-9, cls, gt / 1024.0, masks, std)
        return c + jnp.sum(t.rois) * 1e-9
    scan_time("detection_targets (full)", det_body)

    # iou-pass decomposition: how many [A,G] passes do the where-variants add?
    def iou_once(c, i):
        g = gt + c * 1e-9
        def per(gb, cb):
            iou = box_ops.iou_matrix(anchors, gb)
            valid = cb > 0
            crowd = cb < 0
            iv = jnp.where(valid[None, :], iou, -1.0)
            m1 = jnp.max(iv, 1)
            a1 = jnp.argmax(iv, 1)
            cv = jnp.where(crowd[None, :], iou, -1.0)
            m2 = jnp.max(cv, 1)
            a0 = jnp.argmax(iv, 0)
            return m1, a1, m2, a0
        out = jax.vmap(per)(g, cls)
        return c + jnp.sum(out[0]) * 1e-9
    scan_time("iou + all 4 reductions (as in rpn)", iou_once)


if __name__ == "__main__":
    main()
