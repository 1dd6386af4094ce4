"""Weight-import tests with synthetic reference-format state dicts."""

import re

import numpy as np
import pytest
from flax import traverse_util

from feature_intertwiner_tpu.utils.convert_weights import (
    convert_reference_state_dict, merge_pretrained)


# --- inverse mapping: our flax tree -> reference torch names/layouts -------
# Used to synthesize FULL-schema checkpoints (every key the reference's
# save_model writes for an R*-FPN + Dev + OT + FPN-OT model,
# /root/reference/tools/utils.py:567-586) whose shapes match a real model.
_REF_NAME_RULES = [
    (r"^backbone/c1_conv$", "fpn.C1.0"),
    (r"^backbone/c1_bn$", "fpn.C1.1"),
    (r"^backbone/c(\d)/block(\d+)/conv(\d)$", r"fpn.C\1.\2.conv\3"),
    (r"^backbone/c(\d)/block(\d+)/bn(\d)$", r"fpn.C\1.\2.bn\3"),
    (r"^backbone/c(\d)/block(\d+)/proj_conv$", r"fpn.C\1.\2.downsample.0"),
    (r"^backbone/c(\d)/block(\d+)/proj_bn$", r"fpn.C\1.\2.downsample.1"),
    (r"^fpn/p(\d)_lateral$", r"fpn.P\1_conv1"),
    (r"^fpn/p(\d)_out$", r"fpn.P\1_conv2.1"),
    (r"^fpn/p(\d)_ot/g_deconv$", r"fpn.p\1_ot.G_net.0"),
    (r"^fpn/p(\d)_ot/g_bn$", r"fpn.p\1_ot.G_net.1"),
    (r"^fpn/p(\d)_ot/critic_conv1$", r"fpn.p\1_ot.critic.0"),
    (r"^fpn/p(\d)_ot/critic_bn1$", r"fpn.p\1_ot.critic.1"),
    (r"^fpn/p(\d)_ot/critic_conv2$", r"fpn.p\1_ot.critic.3"),
    (r"^fpn/p(\d)_ot/critic_bn2$", r"fpn.p\1_ot.critic.4"),
    (r"^rpn/shared$", "rpn.conv_shared"),
    (r"^rpn/cls$", "rpn.conv_class"),
    (r"^rpn/bbox$", "rpn.conv_bbox"),
    (r"^classifier/fc(\d)$", r"classifier.conv\1"),
    (r"^classifier/bn(\d)$", r"classifier.bn\1"),
    (r"^classifier/(linear_\w+)$", r"classifier.\1"),
    (r"^mask/conv(\d)$", r"mask.conv\1"),
    (r"^mask/bn(\d)$", r"mask.bn\1"),
    (r"^mask/upsample$", "mask.deconv"),
    (r"^mask/logits$", "mask.conv5"),
    (r"^dev/upsample(\d)/(?:conv|deconv)$", r"dev_roi.upsample.\1.0"),
    (r"^dev/upsample(\d)/bn$", r"dev_roi.upsample.\1.1"),
    (r"^dev/critic/conv(\d)$",
     lambda m: f"dev_roi.feat_extract.{(int(m.group(1)) - 1) * 3}"),
    (r"^dev/critic/bn(\d)$",
     lambda m: f"dev_roi.feat_extract.{(int(m.group(1)) - 1) * 3 + 1}"),
    (r"^dev/big_fc$", "dev_roi.big_fc_layer"),
    (r"^ot_loss/g_conv$", "ot_loss.G_net.0"),
    (r"^ot_loss/critic_conv$", "ot_loss.critic.0"),
    (r"^ot_loss/critic_fc$", "ot_loss.critic"),
]


def _ref_module_name(base: str) -> str:
    for pat, repl in _REF_NAME_RULES:
        m = re.match(pat, base)
        if m:
            return m.expand(repl) if isinstance(repl, str) else repl(m)
    raise KeyError(f"no reference name for flax module path {base!r}")


def _to_reference_sd(params, batch_stats):
    """Synthesize the reference state_dict a real checkpoint would carry,
    inverting every layout conversion the importer performs."""
    sd = {}

    def inv_kernel(base, w):
        w = np.asarray(w)
        if base == "mask/upsample" or base.endswith("/g_deconv") or \
                re.match(r"^dev/upsample\d/deconv$", base):
            # flax ConvTranspose [kh,kw,I,O] (flipped) -> torch [I,O,kh,kw]
            return np.ascontiguousarray(
                np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
        if w.ndim == 3:     # flax 1-D conv [k,I,O] -> torch Conv1d [O,I,k]
            return np.transpose(w, (2, 1, 0))
        if w.ndim == 2:     # flax Dense [I,O] -> torch Linear [O,I]
            return np.transpose(w, (1, 0))
        return np.transpose(w, (3, 2, 0, 1))   # conv HWIO -> OIHW

    flat_p = {"/".join(k): np.asarray(v) for k, v in
              traverse_util.flatten_dict(params).items()}
    for path, v in flat_p.items():
        if path.endswith("/BatchNorm_0/scale"):
            sd[_ref_module_name(path[:-len("/BatchNorm_0/scale")])
               + ".weight"] = v
        elif path.endswith("/BatchNorm_0/bias"):
            sd[_ref_module_name(path[:-len("/BatchNorm_0/bias")])
               + ".bias"] = v
        elif path.endswith("/kernel"):
            base = path[:-len("/kernel")]
            sd[_ref_module_name(base) + ".weight"] = inv_kernel(base, v)
        elif path.endswith("/bias"):
            sd[_ref_module_name(path[:-len("/bias")]) + ".bias"] = v
        else:
            raise KeyError(f"unexpected param leaf {path}")
    flat_s = {"/".join(k): np.asarray(v) for k, v in
              traverse_util.flatten_dict(batch_stats).items()}
    for path, v in flat_s.items():
        stat = "running_mean" if path.endswith("/mean") else "running_var"
        base = path.rsplit("/BatchNorm_0/", 1)[0]
        name = _ref_module_name(base)
        sd[f"{name}.{stat}"] = v
        # torch BN also serializes a counter; the converter must skip it
        sd[f"{name}.num_batches_tracked"] = np.int64(100)
    return sd


def _fake_reference_sd():
    """Minimal reference-style state_dict covering each mapping family."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32)

    conv("fpn.C1.0", 64, 3, 7)
    bn("fpn.C1.1", 64)
    conv("fpn.C2.0.conv1", 64, 64, 1)
    bn("fpn.C2.0.bn1", 64)
    conv("fpn.C2.0.downsample.0", 256, 64, 1)
    bn("fpn.C2.0.downsample.1", 256)
    conv("fpn.P5_conv1", 256, 2048, 1)
    conv("fpn.P5_conv2.1", 256, 256, 3)
    conv("rpn.conv_shared", 512, 256, 3)
    conv("classifier.conv1", 1024, 256, 7)
    bn("classifier.bn1", 1024)
    sd["classifier.linear_class.weight"] = rng.randn(81, 1024).astype(np.float32)
    sd["classifier.linear_class.bias"] = rng.randn(81).astype(np.float32)
    conv("mask.conv1", 256, 256, 3)
    bn("mask.bn1", 256)
    sd["mask.deconv.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32)
    sd["mask.deconv.bias"] = rng.randn(256).astype(np.float32)
    conv("dev_roi.feat_extract.0", 512, 256, 3)
    bn("dev_roi.feat_extract.1", 512)
    sd["dev_roi.big_fc_layer.weight"] = rng.randn(81, 1024).astype(np.float32)
    sd["dev_roi.big_fc_layer.bias"] = rng.randn(81).astype(np.float32)
    return sd


@pytest.mark.slow
def test_reference_mapping_and_layout():
    sd = _fake_reference_sd()
    params, stats = convert_reference_state_dict(sd, "resnet50")
    p = {"/".join(k): v for k, v in traverse_util.flatten_dict(params).items()}
    s = {"/".join(k): v for k, v in traverse_util.flatten_dict(stats).items()}

    # conv layout OIHW -> HWIO
    assert p["backbone/c1_conv/kernel"].shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        p["backbone/c1_conv/kernel"][0, 0, 0, :],
        sd["fpn.C1.0.weight"][:, 0, 0, 0])
    # bn split into params + stats
    np.testing.assert_allclose(
        p["backbone/c1_bn/BatchNorm_0/scale"], sd["fpn.C1.1.weight"])
    np.testing.assert_allclose(
        s["backbone/c1_bn/BatchNorm_0/mean"], sd["fpn.C1.1.running_mean"])
    # stage block with projection
    assert p["backbone/c2/block0/proj_conv/kernel"].shape == (1, 1, 64, 256)
    # laterals / heads
    assert p["fpn/p5_lateral/kernel"].shape == (1, 1, 2048, 256)
    assert p["fpn/p5_out/kernel"].shape == (3, 3, 256, 256)
    # linear transpose
    assert p["classifier/linear_class/kernel"].shape == (1024, 81)
    np.testing.assert_allclose(
        p["classifier/linear_class/kernel"],
        sd["classifier.linear_class.weight"].T)
    # deconv layout [I,O,kh,kw] -> [kh,kw,I,O] flipped
    assert p["mask/upsample/kernel"].shape == (2, 2, 256, 256)
    np.testing.assert_allclose(
        p["mask/upsample/kernel"][0, 0], sd["mask.deconv.weight"][:, :, 1, 1])
    # dev critic + big_fc
    assert p["dev/critic/conv1/kernel"].shape == (3, 3, 256, 512)
    assert p["dev/big_fc/kernel"].shape == (1024, 81)


def test_merge_pretrained_overlay_reports():
    sd = _fake_reference_sd()
    loaded_p, loaded_s = convert_reference_state_dict(sd, "resnet50")
    # an init tree with one matching leaf, one missing, one mismatched
    init_p = {
        "backbone": {"c1_conv": {"kernel": np.zeros((7, 7, 3, 64), np.float32),
                                 "bias": np.zeros(64, np.float32)}},
        "extra": {"leaf": np.zeros(3, np.float32)},
        "fpn": {"p5_lateral": {"kernel": np.zeros((1, 1, 999, 256), np.float32)}},
    }
    logs = []
    merged_p, _ = merge_pretrained(init_p, {}, loaded_p, loaded_s,
                                   log_fn=logs.append)
    flat = {"/".join(k): v for k, v in
            traverse_util.flatten_dict(merged_p).items()}
    lp = {"/".join(k): v for k, v in
          traverse_util.flatten_dict(loaded_p).items()}
    np.testing.assert_allclose(flat["backbone/c1_conv/kernel"],
                               lp["backbone/c1_conv/kernel"])
    assert (flat["extra/leaf"] == 0).all()          # missing stays init
    assert (flat["fpn/p5_lateral/kernel"] == 0).all()  # mismatch stays init
    assert any("shape-mismatch 1" in l for l in logs)


def test_apply_cross_name_init():
    from feature_intertwiner_tpu.utils.convert_weights import (
        apply_cross_name_init)
    params = {
        "classifier": {"linear_class": {"kernel": np.ones((4, 3)),
                                        "bias": np.ones(3)}},
        "dev": {"big_fc": {"kernel": np.zeros((4, 3)),
                           "bias": np.zeros(3)}},
    }
    out = apply_cross_name_init(params, {
        "dev/big_fc/kernel": "classifier/linear_class/kernel",
        "dev/big_fc/bias": "classifier/linear_class/bias",
        "dev/missing/x": "classifier/linear_class/bias",
    }, log_fn=lambda m: None)
    np.testing.assert_array_equal(out["dev"]["big_fc"]["kernel"],
                                  np.ones((4, 3)))
    np.testing.assert_array_equal(out["dev"]["big_fc"]["bias"], np.ones(3))


@pytest.mark.slow
def test_convert_keras_h5_roundtrip(tmp_path):
    """Build a synthetic Matterport-style h5 and convert it."""
    import h5py
    from feature_intertwiner_tpu.utils.convert_weights import (
        BOTTLENECKS, _keras_block_name, convert_keras_h5)

    rng = np.random.RandomState(0)
    path = str(tmp_path / "keras.h5")
    widths = {2: 64, 3: 128, 4: 256, 5: 512}

    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")

        def conv(name, kh, kw, ci, co):
            grp = g.create_group(name).create_group(name)
            grp["kernel:0"] = rng.randn(kh, kw, ci, co).astype(np.float32)
            grp["bias:0"] = rng.randn(co).astype(np.float32)

        def bn(name, c):
            grp = g.create_group(name).create_group(name)
            grp["gamma:0"] = rng.rand(c).astype(np.float32)
            grp["beta:0"] = rng.randn(c).astype(np.float32)
            grp["moving_mean:0"] = rng.randn(c).astype(np.float32)
            grp["moving_variance:0"] = rng.rand(c).astype(np.float32)

        conv("conv1", 7, 7, 3, 64)
        bn("bn_conv1", 64)
        cin = 64
        for stage, blocks in zip((2, 3, 4, 5), BOTTLENECKS["resnet50"]):
            w = widths[stage]
            for b in range(blocks):
                letter = _keras_block_name(stage, b, blocks)
                conv(f"res{stage}{letter}_branch2a", 1, 1, cin if b == 0 else w * 4, w)
                bn(f"bn{stage}{letter}_branch2a", w)
                conv(f"res{stage}{letter}_branch2b", 3, 3, w, w)
                bn(f"bn{stage}{letter}_branch2b", w)
                conv(f"res{stage}{letter}_branch2c", 1, 1, w, w * 4)
                bn(f"bn{stage}{letter}_branch2c", w * 4)
                if b == 0:
                    conv(f"res{stage}{letter}_branch1", 1, 1, cin, w * 4)
                    bn(f"bn{stage}{letter}_branch1", w * 4)
            cin = w * 4
        for lvl, ci in ((5, 2048), (4, 1024), (3, 512), (2, 256)):
            conv(f"fpn_c{lvl}p{lvl}", 1, 1, ci, 256)
            conv(f"fpn_p{lvl}", 3, 3, 256, 256)
        conv("rpn_conv_shared", 3, 3, 256, 512)
        conv("rpn_class_raw", 1, 1, 512, 6)
        conv("rpn_bbox_pred", 1, 1, 512, 12)
        conv("mrcnn_class_conv1", 7, 7, 256, 1024)
        bn("mrcnn_class_bn1", 1024)
        conv("mrcnn_class_conv2", 1, 1, 1024, 1024)
        bn("mrcnn_class_bn2", 1024)
        conv("mrcnn_class_logits", 1, 1, 1024, 81)  # keras dense as conv here
        conv("mrcnn_bbox_fc", 1, 1, 1024, 324)
        for i in range(1, 5):
            conv(f"mrcnn_mask_conv{i}", 3, 3, 256, 256)
            bn(f"mrcnn_mask_bn{i}", 256)
        conv("mrcnn_mask_deconv", 2, 2, 256, 256)
        conv("mrcnn_mask", 1, 1, 256, 81)

    params, stats = convert_keras_h5(path, "resnet50")
    from flax import traverse_util
    p = {"/".join(k): v for k, v in traverse_util.flatten_dict(params).items()}
    s = {"/".join(k): v for k, v in traverse_util.flatten_dict(stats).items()}
    assert p["backbone/c1_conv/kernel"].shape == (7, 7, 3, 64)
    assert p["backbone/c4/block5/conv2/kernel"].shape == (3, 3, 256, 256)
    assert p["backbone/c5/block0/proj_conv/kernel"].shape == (1, 1, 1024, 2048)
    assert s["backbone/c3/block2/bn3/BatchNorm_0/var"].shape == (512,)
    assert p["fpn/p2_lateral/kernel"].shape == (1, 1, 256, 256)
    assert p["mask/upsample/kernel"].shape == (2, 2, 256, 256)


def test_keras_deconv_layout_matches_torch_path():
    """keras Conv2DTranspose [kh,kw,OUT,IN] through the keras path must equal
    the reference-converter blanket (3,2,0,1) transpose composed with the
    torch _deconv (permute + spatial flip)."""
    from feature_intertwiner_tpu.utils.convert_weights import _deconv
    rng = np.random.RandomState(0)
    k = rng.randn(2, 2, 5, 7).astype(np.float32)     # [kh, kw, OUT, IN]
    via_torch = _deconv(np.transpose(k, (3, 2, 0, 1)))  # keras->torch->flax
    direct = np.transpose(k, (0, 1, 3, 2))[::-1, ::-1]  # the kdeconv math
    np.testing.assert_array_equal(via_torch, direct)


@pytest.mark.slow
def test_full_schema_strict_conversion_round_trip():
    """Full reference checkpoint schema (Dev + meta-OT + FPN-OT + mask +
    big_fc, every BN with running stats + counters) synthesized from a real
    model: strict conversion must consume EVERY key, and the merged tree
    must round-trip bit-exactly with nothing missing or unused
    (VERDICT r1 #5)."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_forward import _synthetic_batch, tiny_model

    model = tiny_model(dev_loss_choice="ot", fpn_ot_loss=True,
                       dev_big_supervise=True)
    rng = np.random.RandomState(0)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
        gt_masks=gt_masks)
    params, stats = v["params"], v.get("batch_stats", {})

    sd = _to_reference_sd(params, stats)
    assert any(k.startswith("ot_loss.") for k in sd)
    assert any(".p2_ot." in k for k in sd)
    assert "dev_roi.big_fc_layer.weight" in sd

    # strict: raises if any source key has no mapping
    lp, ls = convert_reference_state_dict(sd, "resnet50", upsample_fac=1.0,
                                          strict=True)
    logs = []
    mp, ms = merge_pretrained(params, stats, lp, ls, log_fn=logs.append)
    assert any(l.startswith("[params]") and "from-scratch 0," in l
               and "unused 0" in l for l in logs), logs
    assert any(l.startswith("[batch_stats]") and "from-scratch 0," in l
               and "unused 0" in l for l in logs), logs
    for label, orig, merged in (("params", params, mp),
                                ("stats", stats, ms)):
        got = traverse_util.flatten_dict(merged)
        for k, vv in traverse_util.flatten_dict(orig).items():
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(vv),
                err_msg=f"{label}:{'/'.join(k)}")


def test_strict_conversion_reports_unmapped_keys():
    sd = _fake_reference_sd()
    sd["dev_roi.mystery_layer.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="mystery_layer"):
        convert_reference_state_dict(sd, "resnet50", strict=True)
    logs = []
    convert_reference_state_dict(sd, "resnet50", log_fn=logs.append)
    assert any("UNMAPPED dev_roi.mystery_layer.weight" in l for l in logs)


@pytest.mark.slow
def test_trainer_resume_from_reference_pth(tmp_path):
    """Trainer.resume must train from a synthesized full save_model payload:
    weights overlaid, intertwiner buffer + epoch/iter counters restored
    (parity: tools/utils.py:321-347,374-389, save_model :579-586)."""
    import os
    import sys

    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_forward import _synthetic_batch

    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.train.workflow import Trainer

    cfg = build_config()
    cfg.DATASET.NUM_CLASSES = 8
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.DATA.IMAGE_MIN_DIM = 96
    cfg.DATA.IMAGE_MAX_DIM = 128
    cfg.RPN.ANCHOR_SCALES = (8, 16, 32, 64, 128)
    cfg.RPN.PRE_NMS_LIMIT = 200
    cfg.RPN.POST_NMS_ROIS_TRAINING = 64
    cfg.RPN.POST_NMS_ROIS_INFERENCE = 48
    cfg.ROIS.TRAIN_ROIS_PER_IMAGE = 24
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.DEV.SWITCH = True
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.BUFFER_SIZE = 1
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.finalize()
    cfg.MISC.RESULT_FOLDER = str(tmp_path / "run")

    model = InterNet.from_config(cfg)
    rng = np.random.RandomState(1)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    init_args = dict(mode="train", gt_class_ids=gt_cls, gt_boxes=gt_boxes,
                     gt_masks=gt_masks)
    v0 = model.init({"params": jax.random.PRNGKey(7),
                     "sampling": jax.random.PRNGKey(8)}, images, **init_args)

    sd = _to_reference_sd(v0["params"], v0.get("batch_stats", {}))
    buf = np.random.RandomState(2).rand(1, 1024, 8).astype(np.float32)
    cnt = np.ones((1, 1, 8), np.float32)
    pth = str(tmp_path / "mask_rcnn_ref.pth")
    torch.save({
        "state_dict": {k: torch.from_numpy(np.asarray(vv))
                       for k, vv in sd.items()},
        "epoch": 2, "iter": 0, "buffer": buf, "buffer_cnt": cnt,
        "loss_data": {},
    }, pth)
    cfg.MODEL.INIT_FILE_CHOICE = pth

    v1 = model.init({"params": jax.random.PRNGKey(99),
                     "sampling": jax.random.PRNGKey(100)}, images, **init_args)
    trainer = Trainer(model, cfg, v1).resume()

    got = traverse_util.flatten_dict(trainer.state.params)
    for k, vv in traverse_util.flatten_dict(v0["params"]).items():
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(vv),
                                   err_msg="/".join(k))
    np.testing.assert_allclose(np.asarray(trainer.state.buffer), buf)
    np.testing.assert_allclose(np.asarray(trainer.state.buffer_cnt), cnt)
    assert trainer.epoch == 2 and trainer.iter == 1

    step = trainer._get_step("all")
    batch = dict(images=jnp.asarray(images),
                 gt_class_ids=jnp.asarray(gt_cls),
                 gt_boxes=jnp.asarray(gt_boxes),
                 gt_masks=jnp.asarray(gt_masks))
    trainer.state, metrics = step(trainer.state, batch, jnp.float32(1e-3),
                                  jnp.float32(1.0), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))

    # FORCE_START_EPOCH must override the payload's counters (weights-only
    # init from a .pth whose payload carries a large epoch)
    cfg.TRAIN.FORCE_START_EPOCH = 1
    t2 = Trainer(model, cfg, v1).resume()
    assert t2.epoch == 1 and t2.iter == 1
    np.testing.assert_allclose(np.asarray(t2.state.buffer), buf)

    # ... and for every other init source (the reference applies it
    # unconditionally, tools/utils.py:344-347): an .npz overlay carries no
    # counters at all, and a fresh start has none to override
    flat_p = {"params/" + "/".join(k): np.asarray(vv) for k, vv in
              traverse_util.flatten_dict(v0["params"]).items()}
    npz = str(tmp_path / "overlay.npz")
    np.savez(npz, **flat_p)
    cfg.MODEL.INIT_FILE_CHOICE = npz
    cfg.TRAIN.FORCE_START_EPOCH = 3
    t3 = Trainer(model, cfg, v1).resume()
    assert t3.epoch == 3 and t3.iter == 1

    cfg.MODEL.INIT_FILE_CHOICE = ""
    t4 = Trainer(model, cfg, v1).resume()
    assert t4.epoch == 3 and t4.iter == 1

    cfg.MODEL.INIT_FILE_CHOICE = pth
    cfg.TRAIN.FORCE_START_EPOCH = 0

    # a payload missing buffer_cnt (partial re-save) degrades to a
    # reinitialized buffer instead of raising KeyError
    pth2 = str(tmp_path / "partial.pth")
    torch.save({
        "state_dict": {k: torch.from_numpy(np.asarray(vv))
                       for k, vv in sd.items()},
        "epoch": 1, "iter": 0, "buffer": buf, "loss_data": {},
    }, pth2)
    cfg.MODEL.INIT_FILE_CHOICE = pth2
    t3 = Trainer(model, cfg, v1).resume()
    assert float(np.abs(np.asarray(t3.state.buffer)).sum()) == 0.0


@pytest.mark.slow
def test_strict_resume_buffer_mismatch_raises(tmp_path):
    """TRAIN.STRICT_RESUME turns the silent buffer-reinit fallback
    (reference: tools/utils.py:374-389) into a hard failure — a flagship
    meta-loss resume must not drop its historic buffer undetected."""
    import os
    import sys

    import jax
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_forward import _synthetic_batch

    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.train.workflow import Trainer

    cfg = build_config()
    cfg.DATASET.NUM_CLASSES = 8
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.DATA.IMAGE_MIN_DIM = 96
    cfg.DATA.IMAGE_MAX_DIM = 128
    cfg.RPN.ANCHOR_SCALES = (8, 16, 32, 64, 128)
    cfg.RPN.PRE_NMS_LIMIT = 200
    cfg.RPN.POST_NMS_ROIS_TRAINING = 64
    cfg.RPN.POST_NMS_ROIS_INFERENCE = 48
    cfg.ROIS.TRAIN_ROIS_PER_IMAGE = 24
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.DEV.SWITCH = True
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.BUFFER_SIZE = 1
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.finalize()
    cfg.MISC.RESULT_FOLDER = str(tmp_path / "run")

    model = InterNet.from_config(cfg)
    rng = np.random.RandomState(1)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng)
    v = model.init({"params": jax.random.PRNGKey(7),
                    "sampling": jax.random.PRNGKey(8)}, images, mode="train",
                   gt_class_ids=gt_cls, gt_boxes=gt_boxes, gt_masks=gt_masks)

    sd = _to_reference_sd(v["params"], v.get("batch_stats", {}))
    # payload buffer from a BUFFER_SIZE=4 run vs the model's BUFFER_SIZE=1
    bad_buf = np.random.RandomState(2).rand(4, 1024, 8).astype(np.float32)
    pth = str(tmp_path / "mismatch.pth")
    torch.save({
        "state_dict": {k: torch.from_numpy(np.asarray(vv))
                       for k, vv in sd.items()},
        "epoch": 1, "iter": 0, "buffer": bad_buf,
        "buffer_cnt": np.ones((4, 1, 8), np.float32), "loss_data": {},
    }, pth)
    cfg.MODEL.INIT_FILE_CHOICE = pth

    cfg.TRAIN.STRICT_RESUME = True
    with pytest.raises(ValueError, match="STRICT_RESUME"):
        Trainer(model, cfg, v).resume()

    # default behavior unchanged: log + reinitialize (parity fallback)
    cfg.TRAIN.STRICT_RESUME = False
    t = Trainer(model, cfg, v).resume()
    assert float(np.abs(np.asarray(t.state.buffer)).sum()) == 0.0
