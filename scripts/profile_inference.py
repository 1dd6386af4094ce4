"""Phase-level inference profiling on one chip (R50-FPN, 1024^2, bf16).

Compiles truncated forwards (backbone+FPN / +RPN+proposals / +box stage /
full) and times each to localize where batch-inference time goes. Informs
kernel work; not part of the driver bench.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.models.rpn import run_rpn_over_pyramid
from feature_intertwiner_tpu.ops.proposals import proposal_layer

BATCH = int(os.environ.get("B", "32"))
SIZE = int(os.environ.get("S", "1024"))
ITERS = int(os.environ.get("I", "6"))


def scalarize(fn):
    """Wrap so the jitted program returns one f32 scalar (no D2H weight)."""
    def wrapped(*args):
        out = fn(*args)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), out, 0.0)
    return jax.jit(wrapped)


def timeit(name, fn, *args):
    fn = scalarize(fn)
    np.asarray(fn(*args))  # compile + sync via transfer
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.1f} ms/batch   {BATCH/dt:7.1f} img/s")
    return dt


def main():
    use_window = os.environ.get("W", "1") != "0"  # window-DMA RoIAlign
    model = InterNet(backbone="resnet50", num_classes=81, image_size=SIZE,
                     dev_switch=True, dev_loss_choice="l2",
                     dev_upsample_fac=1.0, roi_window_kernel=use_window,
                     dtype=jnp.bfloat16)
    print(f"roi_window_kernel={use_window}")
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(BATCH, SIZE, SIZE, 3).astype(np.float32))
    windows = jnp.tile(jnp.array([[0., 0., SIZE, SIZE]], jnp.float32),
                       (BATCH, 1))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, images[:1], mode="inference",
        windows=windows[:1]))()

    def bind(fn_name):
        def wrapper(v, *a):
            def run(mdl, *aa):
                return getattr(mdl, fn_name)(*aa) if fn_name else None
            return model.apply(v, *a, method=run)
        return wrapper

    def backbone_fpn(v, im):
        def run(mdl, im):
            c2, c3, c4, c5 = mdl.resnet(im.astype(mdl.dtype), False)
            pyr, _ = mdl.fpn(c2, c3, c4, c5, train=False, train_bn=False)
            return pyr
        return model.apply(v, im, method=run)

    def thru_rpn(v, im):
        def run(mdl, im):
            c2, c3, c4, c5 = mdl.resnet(im.astype(mdl.dtype), False)
            pyr, _ = mdl.fpn(c2, c3, c4, c5, train=False, train_bn=False)
            return run_rpn_over_pyramid(mdl.rpn, pyr)
        return model.apply(v, im, method=run)

    def thru_proposals(v, im):
        def run(mdl, im):
            return mdl._features_and_proposals(im, train=False,
                                               train_bn=False)[3]
        return model.apply(v, im, method=run)

    def thru_boxstage(v, im, win):
        def run(mdl, im, win):
            maps, _, _, proposals, _ = mdl._features_and_proposals(
                im, train=False, train_bn=False)
            pooled_cls, _, _ = mdl.dev(maps, proposals, roi_gt=None,
                                       train=False, need_cls=True,
                                       need_mask=False, need_small=False)
            _, probs, bbox, _ = mdl.classifier(pooled_cls, None, None)
            return probs
        return model.apply(v, im, win, method=run)

    def thru_detection(v, im, win):
        def run(mdl, im, win):
            from feature_intertwiner_tpu.ops.detection import detection_layer
            b = im.shape[0]
            maps, _, _, proposals, _ = mdl._features_and_proposals(
                im, train=False, train_bn=False)
            pooled_cls, _, _ = mdl.dev(maps, proposals, roi_gt=None,
                                       train=False, need_cls=True,
                                       need_mask=False, need_small=False)
            _, probs, bbox, _ = mdl.classifier(pooled_cls, None, None)
            r = proposals.shape[1]
            probs = probs.reshape(b, r, mdl.num_classes)
            bbox = bbox.reshape(b, r, mdl.num_classes, 4)
            det, _, _ = detection_layer(
                proposals, probs, bbox, win.astype(jnp.float32),
                jnp.asarray(mdl.bbox_std, jnp.float32),
                (mdl.image_size, mdl.image_size),
                max_instances=mdl.det_max_instances,
                nms_threshold=mdl.det_nms_threshold,
                min_confidence=mdl.det_min_confidence)
            return det
        return model.apply(v, im, win, method=run)

    def full(v, im, win):
        return model.apply(v, im, mode="inference", windows=win)

    print(f"batch={BATCH} size={SIZE} iters={ITERS}")
    timeit("backbone+FPN", backbone_fpn, variables, images)
    timeit("+RPN heads", thru_rpn, variables, images)
    timeit("+proposals(NMS)", thru_proposals, variables, images)
    timeit("+dev+classifier", thru_boxstage, variables, images, windows)
    timeit("+detection layer", thru_detection, variables, images, windows)
    timeit("full (incl mask)", full, variables, images, windows)


if __name__ == "__main__":
    main()
