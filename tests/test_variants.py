"""Config-variant coverage: OT meta loss, INST_LOSS, FPN OT, roi_pool
method, BIG_SUPERVISE, baseline mode, no-upsampler, all-scale assignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.train.step import create_train_state, make_train_step
from test_model_forward import _synthetic_batch, tiny_model
from test_train_step import _cfg


def _init_and_step(model, cfg, seed=0):
    rng = np.random.RandomState(seed)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    batch = dict(images=images, gt_class_ids=gt_cls, gt_boxes=gt_boxes,
                 gt_masks=gt_masks)
    state = create_train_state(cfg, variables)
    step = jax.jit(make_train_step(model, cfg, layers="all"))
    s1, m = step(state, batch, jnp.float32(1e-3), jnp.float32(1.0),
                 jax.random.PRNGKey(2))
    return variables, s1, {k: float(v) for k, v in jax.device_get(m).items()}


@pytest.mark.slow
def test_ot_meta_loss_trains():
    model = tiny_model(dev_loss_choice="ot")
    cfg = _cfg(**{"DEV.LOSS_CHOICE": "ot"})
    variables, s1, m = _init_and_step(model, cfg)
    assert "ot_loss" in variables["params"], "OT module params must exist"
    assert np.isfinite(m["total_loss"])
    assert m["meta_loss"] >= 0.0


@pytest.mark.slow
def test_inst_loss_variant():
    model = tiny_model(dev_loss_choice="l2")
    cfg = _cfg(**{"DEV.INST_LOSS": True})
    _, s1, m = _init_and_step(model, cfg)
    assert np.isfinite(m["total_loss"]) and m["meta_loss"] >= 0


@pytest.mark.slow
def test_big_supervise_variant():
    model = tiny_model(dev_big_supervise=True)
    cfg = _cfg(**{"DEV.BIG_SUPERVISE": True})
    variables, s1, m = _init_and_step(model, cfg)
    assert "big_fc" in variables["params"]["dev"]
    assert np.isfinite(m["big_loss"])


@pytest.mark.slow
def test_fpn_ot_loss_variant():
    model = tiny_model(fpn_ot_loss=True)
    cfg = _cfg(**{"TRAIN.FPN_OT_LOSS": True})
    variables, s1, m = _init_and_step(model, cfg)
    assert "p4_ot" in variables["params"]["fpn"]
    assert np.isfinite(m["fpn_ot_loss"])


@pytest.mark.slow
def test_roi_pool_method_forward():
    model = tiny_model(roi_method="roi_pool")
    rng = np.random.RandomState(1)
    images, gt_cls, gt_boxes, gt_masks, windows = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    out = model.apply(variables, images, mode="inference", windows=windows)
    assert np.isfinite(np.asarray(out["detections"])).all()


@pytest.mark.slow
def test_baseline_and_disabled_upsampler():
    model = tiny_model(dev_baseline=True, dev_dis_upsampler=True)
    rng = np.random.RandomState(2)
    images, gt_cls, gt_boxes, gt_masks, windows = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    out = model.apply(
        variables, images, mode="train", gt_class_ids=gt_cls,
        gt_boxes=gt_boxes, gt_masks=gt_masks,
        rngs={"sampling": jax.random.PRNGKey(3)})
    assert "intertwiner" not in out  # baseline: no stats
    assert "upsample0" not in variables["params"].get("dev", {})


@pytest.mark.slow
def test_assign_all_scale_variant():
    model = tiny_model(dev_assign_all_scale=True)
    cfg = _cfg(**{"DEV.ASSIGN_BOX_ON_ALL_SCALE": True})
    _, s1, m = _init_and_step(model, cfg)
    assert np.isfinite(m["total_loss"])


@pytest.mark.slow
def test_cls_merge_feat_variant():
    model = tiny_model(cls_merge_feat=True, cls_merge_manner="linear_add")
    rng = np.random.RandomState(3)
    images, gt_cls, gt_boxes, gt_masks, windows = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    out = model.apply(variables, images, mode="inference", windows=windows)
    assert np.isfinite(np.asarray(out["detections"])).all()


@pytest.mark.slow
def test_bn_learn_updates_batch_stats():
    model = tiny_model()
    cfg = _cfg(**{"TRAIN.BN_LEARN": True})
    rng = np.random.RandomState(6)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    batch = dict(images=images, gt_class_ids=gt_cls, gt_boxes=gt_boxes,
                 gt_masks=gt_masks)
    state = create_train_state(cfg, variables)
    step = jax.jit(make_train_step(model, cfg, layers="all"))
    s1, m = step(state, batch, jnp.float32(1e-3), jnp.float32(1.0),
                 jax.random.PRNGKey(2))
    before = jax.tree_util.tree_leaves(state.batch_stats)[0]
    after = jax.tree_util.tree_leaves(s1.batch_stats)[0]
    assert float(jnp.abs(after - before).max()) > 0, "BN stats must update"
    assert np.isfinite(m["total_loss"])


@pytest.mark.slow
def test_assign_all_scale_inference_merges_big_rois():
    """At inference with ASSIGN_BOX_ON_ALL_SCALE, RoIs bigger than every
    level's footprint (lvl 6) merge into the level-5 small set — the
    reference's `small_ix = ((accu_small_idx == 0) + small_ix) > 0`
    (sub_module.py:451-454) — so CLS_MERGE/visualize see real features."""
    from feature_intertwiner_tpu.models.intertwiner import Dev

    dev = Dev(num_classes=8, pool_size=7, mask_pool_size=14,
              feat_pool_size=14, image_size=128, use_dev=True,
              upsample_fac=1.0, assign_all_scale=True, loss_choice="l2")
    rng = np.random.RandomState(0)
    feats = [jnp.array(rng.randn(1, s, s, 8).astype(np.float32))
             for s in (32, 16, 8, 4)]
    # one tiny RoI (small at some level) and one full-image RoI (lvl 6)
    rois = jnp.array([[[0.1, 0.1, 0.15, 0.15], [0.0, 0.0, 1.0, 1.0]]],
                     jnp.float32)
    variables = dev.init(
        {"params": jax.random.PRNGKey(0)}, feats, rois,
        roi_gt=jnp.ones((1, 2), jnp.int32), train=True)
    _, _, feat_out = dev.apply(variables, feats, rois)  # inference
    small_gt = np.asarray(feat_out["small_gt"])
    assert small_gt[1] == 1.0, "big-on-all RoI must join the small set"
    assert np.any(np.asarray(feat_out["small_out"])[1] != 0.0)
