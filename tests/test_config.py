import numpy as np
import pytest

from feature_intertwiner_tpu.config import Config, build_config
from feature_intertwiner_tpu.utils.collections import AttrDict


def test_defaults_finalize():
    cfg = build_config()
    assert cfg.DATASET.NUM_CLASSES == 81
    assert cfg.MODEL.BACKBONE_STRIDES == [4, 8, 16, 32, 64]
    assert cfg.TEST.BATCH_SIZE == 2 * cfg.TRAIN.BATCH_SIZE
    np.testing.assert_array_equal(cfg.DATA.IMAGE_SHAPE, [1024, 1024, 3])
    assert cfg.MODEL.BACKBONE_SHAPES.tolist() == [
        [256, 256], [128, 128], [64, 64], [32, 32], [16, 16]]


def test_merge_from_list_coercion():
    cfg = Config()
    cfg.merge_from_list([
        "TRAIN.BATCH_SIZE", "2",
        "DEV.SWITCH", "True",
        "DEV.LOSS_CHOICE", "ot",
        "RPN.ANCHOR_SCALES", "(16, 32, 64, 128, 256)",
        "TRAIN.INIT_LR", "0.02",
    ])
    assert cfg.TRAIN.BATCH_SIZE == 2
    assert cfg.DEV.SWITCH is True
    assert cfg.DEV.LOSS_CHOICE == "ot"
    assert cfg.RPN.ANCHOR_SCALES == (16, 32, 64, 128, 256)
    assert cfg.TRAIN.INIT_LR == 0.02


def test_merge_rejects_unknown_key():
    cfg = Config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.NOT_A_KEY", "1"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOPE.KEY", "1"])


def test_merge_from_file(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "TRAIN:\n  BATCH_SIZE: 3\nDEV:\n  SWITCH: true\n  STRUCTURE: beta\n"
        "DATA:\n  BBOX_STD_DEV: [0.2, 0.2, 0.3, 0.3]\n"
    )
    cfg = Config()
    cfg.merge_from_file(str(p))
    cfg.finalize()
    assert cfg.TRAIN.BATCH_SIZE == 3
    assert cfg.DEV.SWITCH is True
    np.testing.assert_allclose(cfg.DATA.BBOX_STD_DEV, [0.2, 0.2, 0.3, 0.3])


def test_merge_from_file_rejects_unknown(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("TRAIN:\n  TYPO_KEY: 3\n")
    cfg = Config()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(p))


def test_debug_mode_shrinks_images():
    cfg = build_config(debug=True)
    assert cfg.DATA.IMAGE_MAX_DIM == 512
    np.testing.assert_array_equal(cfg.DATA.IMAGE_SHAPE, [512, 512, 3])


def test_attrdict_freeze():
    d = AttrDict(a=1, sub=AttrDict(b=2))
    d.freeze()
    with pytest.raises(AttributeError):
        d.a = 3
    with pytest.raises(AttributeError):
        d.sub.b = 4
    d.freeze(False)
    d.a = 3
    assert d.a == 3


def test_shipped_config_recipes_parse():
    """Every YAML recipe under configs/ must load and finalize."""
    import glob
    import os
    from feature_intertwiner_tpu.config import build_config
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "**", "*.yaml"),
                             recursive=True))
    assert files, "no shipped configs found"
    for f in files:
        cfg = build_config(config_file=f)
        assert cfg.DATA.IMAGE_MAX_DIM > 0


def test_quick_verify_opt_derives_logging_cadence():
    """CTRL.QUICK_VERIFY passed as a CLI opt (the --synthetic_data path)
    must reach finalize() and derive the quick logging/saving cadence."""
    from feature_intertwiner_tpu.config import build_config
    cfg = build_config(opts=["CTRL.QUICK_VERIFY", "True"])
    assert cfg.CTRL.SHOW_INTERVAL == 5
    assert cfg.TRAIN.SAVE_FREQ_WITHIN_EPOCH == 2


def test_compute_dtype_validation_rejects_empty():
    from feature_intertwiner_tpu.config import build_config
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_config(opts=["TPU.COMPUTE_DTYPE", "''"])


def test_strict_quirks_reaches_the_model():
    """MODEL.STRICT_QUIRKS (config-surface knob for the reference's
    truthy-mode-check training behavior, SURVEY §3.5 #1) must plumb
    through from_config — it used to be constructor-only."""
    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet

    cfg = build_config(opts=["MODEL.STRICT_QUIRKS", "False"])
    cfg.finalize()
    assert InterNet.from_config(cfg).strict_quirks is False
    cfg2 = build_config()
    cfg2.finalize()
    assert InterNet.from_config(cfg2).strict_quirks is True
