"""Micro-profile of target-assignment internals (B=8, A=262k, G=100).

Isolates: IoU matrix, argsort-based subsampling vs top_k-based subsampling,
and the detection_targets mask-crop path — to pick the cheapest formulation.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops import boxes as box_ops
from feature_intertwiner_tpu.ops.roi_align import crop_and_resize

B, A, G, P = 8, 261888, 100, 1000
ITERS = int(os.environ.get("I", "10"))


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    anchors = jnp.array(rng.uniform(0, 1024, (A, 4)).astype(np.float32))
    gt = jnp.array(rng.uniform(0, 1024, (B, G, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # 1. IoU matrix alone (vmapped over batch)
    timeit("iou_matrix [B,A,G]",
           jax.vmap(lambda g: box_ops.iou_matrix(anchors, g)), gt)

    # 2. iou + max/argmax reductions
    def red(g):
        iou = box_ops.iou_matrix(anchors, g)
        return jnp.max(iou, 1), jnp.argmax(iou, 1), jnp.argmax(iou, 0)
    timeit("iou + max/argmax x3", jax.vmap(red), gt)

    # 3. argsort-based random-k over A (x2, the current subsample path)
    def argsort_sub(k):
        pos = jax.random.uniform(k, (A,)) < 0.001
        def one(kk):
            s = jnp.where(pos, jax.random.uniform(kk, (A,)), 1e9)
            order = jnp.argsort(s)
            rank = jnp.zeros((A,), jnp.int32).at[order].set(jnp.arange(A))
            return pos & (rank < 128)
        k1, k2 = jax.random.split(k)
        return one(k1), one(k2)
    timeit("argsort subsample x2 (per sample x8)",
           jax.vmap(argsort_sub), jax.random.split(key, B))

    # 4. top_k-based random-k (candidate replacement)
    def topk_sub(k):
        pos = jax.random.uniform(k, (A,)) < 0.001
        def one(kk, cap):
            s = jnp.where(pos, jax.random.uniform(kk, (A,)), -1.0)
            _, idx = jax.lax.top_k(s, cap)
            n = jnp.minimum(jnp.sum(pos.astype(jnp.int32)), cap)
            valid = jnp.arange(cap) < n
            return jnp.zeros((A,), bool).at[idx].set(valid)
        k1, k2 = jax.random.split(k)
        return one(k1, 128), one(k2, 256)
    timeit("top_k subsample (128+256) (x8)",
           jax.vmap(topk_sub), jax.random.split(key, B))

    # 5. detection_targets pieces
    props = jnp.array(rng.uniform(0, 1, (B, P, 4)).astype(np.float32))
    masks = jnp.array((rng.rand(B, G, 56, 56) > .5).astype(np.float32))

    def det_iou(p, g):
        iou = box_ops.iou_matrix(p, g)
        return jnp.max(iou, 1), jnp.argmax(iou, 1)
    timeit("det: iou_matrix [B,P,G] + reductions", jax.vmap(det_iou), props, gt)

    def det_crop(m, p):
        roi_gt = jnp.arange(200, dtype=jnp.int32) % G
        roi_masks = m[roi_gt][..., None]
        crops = crop_and_resize(
            roi_masks, p[:200], jnp.arange(200, dtype=jnp.int32), (28, 28))
        return jnp.round(crops[..., 0])
    timeit("det: gather+crop 200 masks 56->28 (x8)",
           jax.vmap(det_crop), masks, props)

    # 6. random.uniform over A x4 (RNG cost itself)
    timeit("rng uniform [A] x2 (x8)",
           jax.vmap(lambda k: (jax.random.uniform(k, (A,)),
                               jax.random.uniform(jax.random.fold_in(k, 1), (A,)))),
           jax.random.split(key, B))


if __name__ == "__main__":
    main()
