"""Anchor-generation golden tests.

Golden values were produced by running the reference's pure-numpy generator
(/root/reference/lib/layers.py:9-65) offline; they pin ordering (levels in
scale order, cells row-major, ratio fastest) and exact coordinates.
"""

import numpy as np

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.ops.anchors import (
    anchors_for_config,
    generate_level_anchors,
    generate_pyramid_anchors,
)

# Reference output of generate_priors(scales=(32,), ratios=[0.5,1,2],
# shape=[2,3], stride=4, anchor_stride=1).
GOLDEN_SMALL = np.array([
    [-22.627417, -11.313708, 22.627417, 11.313708],
    [-16.0, -16.0, 16.0, 16.0],
    [-11.313708, -22.627417, 11.313708, 22.627417],
    [-22.627417, -7.313708, 22.627417, 15.313708],
    [-16.0, -12.0, 16.0, 20.0],
    [-11.313708, -18.627417, 11.313708, 26.627417],
    [-22.627417, -3.313708, 22.627417, 19.313708],
    [-16.0, -8.0, 16.0, 24.0],
    [-11.313708, -14.627417, 11.313708, 30.627417],
    [-18.627417, -11.313708, 26.627417, 11.313708],
    [-12.0, -16.0, 20.0, 16.0],
    [-7.313708, -22.627417, 15.313708, 22.627417],
    [-18.627417, -7.313708, 26.627417, 15.313708],
    [-12.0, -12.0, 20.0, 20.0],
    [-7.313708, -18.627417, 15.313708, 26.627417],
    [-18.627417, -3.313708, 26.627417, 19.313708],
    [-12.0, -8.0, 20.0, 24.0],
    [-7.313708, -14.627417, 15.313708, 30.627417],
])


def test_level_anchors_golden():
    got = generate_level_anchors(32, [0.5, 1, 2], [2, 3], 4, 1)
    assert got.shape == (18, 4)
    np.testing.assert_allclose(got, GOLDEN_SMALL, atol=1e-5)


def test_pyramid_anchors_full_config():
    shapes = [[256, 256], [128, 128], [64, 64], [32, 32], [16, 16]]
    strides = [4, 8, 16, 32, 64]
    a = generate_pyramid_anchors((32, 64, 128, 256, 512), [0.5, 1, 2], shapes, strides, 1)
    assert a.shape == (261888, 4)
    assert a.dtype == np.float32
    # Aggregates from the reference run.
    np.testing.assert_allclose(a.sum(dtype=np.float64), 533299200.0, rtol=1e-7)
    np.testing.assert_allclose(a.mean(dtype=np.float64), 509.0909090909, rtol=1e-7)
    # First anchor of level P3 (index 256*256*3).
    np.testing.assert_allclose(
        a[196608], [-45.254834, -22.627417, 45.254834, 22.627417], atol=1e-4)
    # Last two anchors (level P6, last cell).
    np.testing.assert_allclose(a[-2], [704.0, 704.0, 1216.0, 1216.0], atol=1e-4)
    np.testing.assert_allclose(
        a[-1], [778.980664, 597.961328, 1141.019336, 1322.038672], atol=1e-4)


def test_anchors_for_config():
    cfg = build_config()
    a = anchors_for_config(cfg)
    assert a.shape == (261888, 4)
