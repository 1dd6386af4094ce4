"""Phase-level train-step profiling on one chip (R50, 1024^2, bf16, batch 16).

Brackets forward vs backward vs intertwiner cost to target kernel work.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.train.step import create_train_state, make_train_step

B = int(os.environ.get("B", "16"))
SIZE = int(os.environ.get("S", "1024"))
ITERS = int(os.environ.get("I", "4"))


def make_batch(batch, size, g=100):
    rng = np.random.RandomState(7)
    images = jnp.array(rng.randn(batch, size, size, 3).astype(np.float32))
    y1x1 = rng.uniform(0, size * 0.6, (batch, g, 2))
    wh = rng.uniform(20, size * 0.4, (batch, g, 2))
    boxes = jnp.array(np.concatenate(
        [y1x1, np.minimum(y1x1 + wh, size - 1)], -1).astype(np.float32))
    cls = jnp.array(rng.randint(1, 81, (batch, g)).astype(np.int32))
    masks = jnp.array((rng.rand(batch, g, 56, 56) > .5).astype(np.float32))
    return dict(images=images, gt_class_ids=cls, gt_boxes=boxes, gt_masks=masks)


def setup(dev_switch):
    cfg = build_config()
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.TRAIN.BATCH_SIZE = B
    cfg.DEV.SWITCH = dev_switch
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.BUFFER_SIZE = 1
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.finalize()
    model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
    data = make_batch(B, SIZE)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data["images"][:1], mode="train",
        gt_class_ids=data["gt_class_ids"][:1],
        gt_boxes=data["gt_boxes"][:1], gt_masks=data["gt_masks"][:1]))()
    return cfg, model, variables, data


def timeit(name, fn, *args):
    o = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(jnp.sum(x)) if hasattr(x, 'shape') else x, o)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = fn(*args)
        leaves = jax.tree_util.tree_leaves(o)
        np.asarray(leaves[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.1f} ms/step   {B/dt:6.2f} img/s")
    return dt


def main():
    for dev in (True, False):
        cfg, model, variables, data = setup(dev)
        state = create_train_state(cfg, variables)
        step = jax.jit(make_train_step(model, cfg, "all"))
        rng = jax.random.PRNGKey(3)

        # full step
        def full(s):
            ns, m = step(s, data, jnp.float32(1e-3), jnp.float32(1.0), rng)
            return m["total_loss"]
        timeit(f"full step (dev={dev})", full, state)

        # forward only (loss value, no grad)
        def fwd(params):
            v = {"params": params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            out = model.apply(v, data["images"], mode="train",
                              gt_class_ids=data["gt_class_ids"],
                              gt_boxes=data["gt_boxes"],
                              gt_masks=data["gt_masks"],
                              rngs={"sampling": rng})
            return sum(out[k] for k in ("rpn_class_loss", "rpn_bbox_loss",
                                        "mrcnn_class_loss", "mrcnn_bbox_loss",
                                        "mrcnn_mask_loss"))
        timeit(f"forward only (dev={dev})", jax.jit(fwd), state.params)

        # forward+backward (no optimizer / buffer)
        timeit(f"fwd+bwd (dev={dev})",
               jax.jit(lambda p: jax.grad(fwd)(p)["fpn"]["p5_lateral"]["kernel"]),
               state.params)


if __name__ == "__main__":
    main()
