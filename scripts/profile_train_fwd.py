"""Phase breakdown of the TRAIN forward (B=8, 1024^2, bf16, R50).

Times the pieces of InterNet.forward_train in isolation:
  features+proposals (backbone/FPN/RPN/proposal-NMS),
  rpn_targets, detection_targets, dev+heads+losses (by running the full
  forward and subtracting). Guides where train-step optimization pays.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.ops.targets import rpn_targets, detection_targets

B = int(os.environ.get("B", "8"))
SIZE = int(os.environ.get("S", "1024"))
ITERS = int(os.environ.get("I", "5"))
G = 100


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
        fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return dt


def main():
    cfg = build_config()
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.TRAIN.BATCH_SIZE = B
    cfg.DEV.SWITCH = True
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.BUFFER_SIZE = 1
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.finalize()
    model = InterNet.from_config(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(7)
    images = jnp.array(rng.randn(B, SIZE, SIZE, 3).astype(np.float32))
    y1x1 = rng.uniform(0, SIZE * 0.6, (B, G, 2))
    wh = rng.uniform(20, SIZE * 0.4, (B, G, 2))
    gt_boxes = jnp.array(np.concatenate(
        [y1x1, np.minimum(y1x1 + wh, SIZE - 1)], -1).astype(np.float32))
    gt_cls = jnp.array(rng.randint(1, 81, (B, G)).astype(np.int32))
    gt_masks = jnp.array((rng.rand(B, G, 56, 56) > .5).astype(np.float32))

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images[:1], mode="train", gt_class_ids=gt_cls[:1],
        gt_boxes=gt_boxes[:1], gt_masks=gt_masks[:1]))()

    key = jax.random.PRNGKey(3)

    # 1. full train forward
    def full(v, im):
        return model.apply(v, im, mode="train", gt_class_ids=gt_cls,
                           gt_boxes=gt_boxes, gt_masks=gt_masks,
                           rngs={"sampling": key})
    t_full = timeit("full train forward", full, variables, images)

    # 2. features + proposals only
    def feats(v, im):
        return model.apply(v, im, mode="train", gt_class_ids=gt_cls,
                           gt_boxes=gt_boxes, gt_masks=gt_masks,
                           rngs={"sampling": key},
                           method=lambda m, i, **kw: m._features_and_proposals(
                               i, train=True, train_bn=False))
    t_feats = timeit("  features+proposals (bkb/fpn/rpn/nms)", feats,
                     variables, images)

    # 3. rpn_targets alone (anchors precomputed on host)
    anchors = jax.jit(lambda: model.apply(
        variables, method=lambda m: m._anchors()))()
    std = jnp.asarray(model.bbox_std, jnp.float32)
    t_rpnt = timeit("  rpn_targets", lambda a: rpn_targets(
        key, a, gt_cls, gt_boxes, std, model.train_anchors_per_image,
        model.rpn_pos_thresh, model.rpn_neg_thresh), anchors)

    # 4. detection_targets alone (random proposals)
    props = jnp.array(
        np.sort(rng.uniform(0, 1, (B, 1000, 4)).astype(np.float32), -1))
    scale = jnp.array([SIZE] * 4, jnp.float32)
    t_dett = timeit("  detection_targets", lambda p: detection_targets(
        key, p, gt_cls, gt_boxes / scale, gt_masks, std,
        model.rois_per_image, model.positive_ratio,
        tuple(model.mask_shape), model.use_mini_mask), props)

    rest = t_full - t_feats - t_rpnt - t_dett
    print(f"{'  dev+heads+losses (residual)':44s} {rest*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
