"""End-to-end forward smoke tests on a tiny config (CPU, virtual devices).

Mirrors the reference's QUICK_VERIFY role (SURVEY.md §4): one jitted forward
per mode on synthetic data; checks shapes, finiteness, and mode contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-model forwards: minutes of XLA compile on one core -> slow tier
pytestmark = pytest.mark.slow

from feature_intertwiner_tpu.models import InterNet

IMG = 128


def tiny_model(**kw):
    defaults = dict(
        backbone="resnet50",
        num_classes=8,
        image_size=IMG,
        anchor_scales=(8, 16, 32, 64, 128),
        pre_nms_limit=200,
        post_nms_train=64,
        post_nms_inference=48,
        rois_per_image=24,
        det_max_instances=8,
        dev_switch=True,
        dev_loss_choice="l2",
        dev_upsample_fac=1.0,
        strict_quirks=True,
    )
    defaults.update(kw)
    return InterNet(**defaults)


def _synthetic_batch(rng, b=1, g=5, mini=14):
    images = rng.randn(b, IMG, IMG, 3).astype(np.float32)
    y1x1 = rng.uniform(5, IMG // 2, (b, g, 2))
    hw = rng.uniform(8, IMG // 2, (b, g, 2))
    gt_boxes = np.concatenate([y1x1, np.minimum(y1x1 + hw, IMG - 1)], -1)
    gt_cls = rng.randint(1, 8, (b, g))
    gt_cls[:, -1] = 0  # padding slot
    gt_boxes[:, -1] = 0
    gt_masks = (rng.rand(b, g, mini, mini) > 0.5).astype(np.float32)
    windows = np.tile(np.array([[0, 0, IMG, IMG]], np.float32), (b, 1))
    return (jnp.array(images), jnp.array(gt_cls), jnp.array(gt_boxes),
            jnp.array(gt_masks), jnp.array(windows))


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = np.random.RandomState(0)
    images, gt_cls, gt_boxes, gt_masks, windows = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    return model, variables


def test_train_forward(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(1)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    out = model.apply(
        variables, images, mode="train", gt_class_ids=gt_cls,
        gt_boxes=gt_boxes, gt_masks=gt_masks,
        rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ("rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
              "mrcnn_bbox_loss", "mrcnn_mask_loss"):
        v = float(out[k])
        assert np.isfinite(v), k
        assert v >= 0, k
    tw = out["intertwiner"]
    assert tw["big_feat"].shape == (3, 1024, 8)
    assert tw["small_feat"].shape == (3, 1024, 8)
    assert tw["small_out"].shape == (24, 1024)
    assert np.isfinite(np.asarray(tw["big_feat"])).all()


def test_inference_forward(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(2)
    images, _, _, _, windows = _synthetic_batch(rng)
    out = model.apply(variables, images, mode="inference", windows=windows)
    det = np.asarray(out["detections"])
    assert det.shape == (1, 8, 6)
    assert np.isfinite(det).all()
    masks = np.asarray(out["masks"])
    # per-detection own-class slice, selected on device (D2H is K x smaller)
    assert masks.shape == (1, 8, 28, 28)
    assert (masks >= 0).all() and (masks <= 1).all()
    # bbox-only eval skips the mask branch entirely
    out2 = model.apply(variables, images, mode="inference", windows=windows,
                       with_masks=False)
    assert "masks" not in out2
    np.testing.assert_allclose(np.asarray(out2["detections"]), det)
    # valid detections have class > 0 and in-bounds boxes
    valid = det[..., 5] > 0
    assert (det[..., :4][valid] >= 0).all()
    assert (det[..., :4][valid] <= IMG).all()


def test_visualize_forward(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(3)
    images, _, _, _, windows = _synthetic_batch(rng)
    out = model.apply(variables, images, mode="visualize", windows=windows)
    assert out["features"].shape == (1, 8, 1024)
    assert np.isfinite(np.asarray(out["features"])).all()


def test_train_forward_without_dev(model_and_params):
    model = tiny_model(dev_switch=False)
    rng = np.random.RandomState(4)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    out = model.apply(
        variables, images, mode="train", gt_class_ids=gt_cls,
        gt_boxes=gt_boxes, gt_masks=gt_masks,
        rngs={"sampling": jax.random.PRNGKey(2)})
    assert "intertwiner" not in out
    assert np.isfinite(float(out["mrcnn_class_loss"]))


def test_param_tree_independent_of_init_mode():
    """The flax param tree must be identical whether init() ran in train,
    inference, or visualize mode — otherwise restoring a train checkpoint
    into an inference-initialized skeleton (diagnose_det.py, profile
    scripts, __graft_entry__.entry) key-mismatches. Exercises every
    train-only param branch at once: big_fc (DEV.BIG_SUPERVISE), the
    Sinkhorn meta-OT generator/critic (LOSS_CHOICE='ot'), and the FPN
    inter-level OT modules (TRAIN.FPN_OT_LOSS)."""
    model = tiny_model(dev_loss_choice="ot", dev_big_supervise=True,
                       fpn_ot_loss=True)
    rng = np.random.RandomState(3)
    images, gt_cls, gt_boxes, gt_masks, windows = _synthetic_batch(rng)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1)}
    # eval_shape avoids compiling three full forwards; the param STRUCTURE
    # (names + shapes) is what restore/serialization keys off
    tree_train = jax.eval_shape(
        lambda: model.init(rngs, images, mode="train", gt_class_ids=gt_cls,
                           gt_boxes=gt_boxes, gt_masks=gt_masks))
    tree_inf = jax.eval_shape(
        lambda: model.init(rngs, images, mode="inference", windows=windows))
    tree_vis = jax.eval_shape(
        lambda: model.init(rngs, images, mode="visualize", windows=windows))

    def shapes(tree):
        return jax.tree_util.tree_map(lambda x: tuple(x.shape),
                                      tree["params"])

    assert shapes(tree_inf) == shapes(tree_train)
    assert shapes(tree_vis) == shapes(tree_train)
