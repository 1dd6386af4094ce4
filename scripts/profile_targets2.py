"""Target-assignment internals, measured with in-graph repetition.

The remote-execution runtime adds ~30ms of per-dispatch latency, so each
candidate op is repeated REPS times inside ONE jitted scan (inputs perturbed
per iteration to defeat CSE) and the scan is timed with a single sync.
Reported number = (t_scan - t_empty_scan) / REPS.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops import boxes as box_ops
from feature_intertwiner_tpu.ops.roi_align import crop_and_resize

B, A, G, P = 8, 261888, 100, 1000
REPS = int(os.environ.get("REPS", "10"))


from _bench import scan_time as _scan_time


def scan_time(name, body, init_carry=None):
    return _scan_time(name, body, reps=REPS)


def main():
    rng = np.random.RandomState(0)
    anchors = jnp.array(rng.uniform(0, 1024, (A, 4)).astype(np.float32))
    gt = jnp.array(rng.uniform(0, 1024, (B, G, 4)).astype(np.float32))
    props = jnp.array(rng.uniform(0, 1, (B, P, 4)).astype(np.float32))
    masks = jnp.array((rng.rand(B, G, 56, 56) > .5).astype(np.float32))

    # 0. empty scan (dispatch + scan overhead floor)
    scan_time("empty scan floor", lambda c, i: c + 1.0, jnp.zeros(()))

    # 1. IoU matrix [B,A,G] + the reductions rpn_targets needs
    def iou_red(c, i):
        g = gt + c * 1e-9
        def per(gb):
            iou = box_ops.iou_matrix(anchors, gb)
            return (jnp.max(iou, 1) + jnp.float32(0.0),
                    jnp.argmax(iou, 1), jnp.argmax(iou, 0))
        mx, am, am0 = jax.vmap(per)(g)
        return jnp.sum(mx) * 1e-9
    scan_time("iou[B,A,G] + max/argmax x3", iou_red, jnp.zeros(()))

    # 2. argsort subsample x2 over A (current)
    def argsort_sub(c, i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        def per(kk):
            pos = jax.random.uniform(kk, (A,)) < 0.001
            def one(k2):
                s = jnp.where(pos, jax.random.uniform(k2, (A,)), 1e9)
                order = jnp.argsort(s)
                rank = jnp.zeros((A,), jnp.int32).at[order].set(
                    jnp.arange(A, dtype=jnp.int32))
                return pos & (rank < 128)
            ka, kb = jax.random.split(kk)
            return one(ka), one(kb)
        a_, b_ = jax.vmap(per)(jax.random.split(k, B))
        return c + jnp.sum(a_) * 1e-9
    scan_time("argsort subsample x2 (x8)", argsort_sub, jnp.zeros(()))

    # 3. top_k subsample (candidate)
    def topk_sub(c, i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        def per(kk):
            pos = jax.random.uniform(kk, (A,)) < 0.001
            def one(k2, cap):
                s = jnp.where(pos, jax.random.uniform(k2, (A,)), -1.0)
                _, idx = jax.lax.top_k(s, cap)
                n = jnp.minimum(jnp.sum(pos.astype(jnp.int32)), cap)
                valid = jnp.arange(cap) < n
                return jnp.zeros((A,), bool).at[idx].set(valid)
            ka, kb = jax.random.split(kk)
            return one(ka, 128), one(kb, 256)
        a_, b_ = jax.vmap(per)(jax.random.split(k, B))
        return c + jnp.sum(a_) * 1e-9
    scan_time("top_k subsample (128+256) (x8)", topk_sub, jnp.zeros(()))

    # 4. det: iou [B,P,G]
    def det_iou(c, i):
        p = props + c * 1e-9
        def per(pb, gb):
            iou = box_ops.iou_matrix(pb, gb)
            return jnp.max(iou, 1), jnp.argmax(iou, 1)
        mx, am = jax.vmap(per)(p, gt)
        return c + jnp.sum(mx) * 1e-9
    scan_time("det iou[B,P,G] + reductions", det_iou, jnp.zeros(()))

    # 5. det: mask gather+crop
    def det_crop(c, i):
        def per(m, pb):
            roi_gt = jnp.arange(200, dtype=jnp.int32) % G
            roi_masks = m[roi_gt][..., None]
            crops = crop_and_resize(
                roi_masks, pb[:200] + c * 1e-9,
                jnp.arange(200, dtype=jnp.int32), (28, 28))
            return jnp.round(crops[..., 0])
        out = jax.vmap(per)(masks, props)
        return c + jnp.sum(out) * 1e-9
    scan_time("det mask gather+crop (x8)", det_crop, jnp.zeros(()))

    # 6. rng uniform [A] x2 x8
    def rng_only(c, i):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        def per(kk):
            return (jax.random.uniform(kk, (A,)),
                    jax.random.uniform(jax.random.fold_in(kk, 1), (A,)))
        a_, b_ = jax.vmap(per)(jax.random.split(k, B))
        return c + jnp.sum(a_) * 1e-9
    scan_time("rng uniform [A] x2 (x8)", rng_only, jnp.zeros(()))


if __name__ == "__main__":
    main()
