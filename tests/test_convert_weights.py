"""Weight-import tests with synthetic reference-format state dicts."""

import numpy as np
from flax import traverse_util

from feature_intertwiner_tpu.utils.convert_weights import (
    convert_reference_state_dict, merge_pretrained)


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
