"""Window-DMA RoIAlign backward kernel (ops/roi_align_window_bwd.py) vs the
XLA gather transpose — interpret-mode parity (SURVEY.md §4 kernel idiom).
The hybrid-level gradient test lives in test_roi_align_window.py; this file
exercises the strip tiling directly, including the multi-strip halo-spill
path (P2 at 256 rows > strip_h=128) the hybrid test's small maps miss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.roi_align import (
    assign_fpn_level, multilevel_crop_and_resize)
from feature_intertwiner_tpu.ops.roi_align_window import (
    window_origins_and_fits)
from feature_intertwiner_tpu.ops.roi_align_window_bwd import (
    bwd_kernel_supported, multilevel_roi_align_window_bwd)

IMAGE = 1024
B, C = 2, 32
SHAPES = ((B, 256, 256, C), (B, 128, 128, C), (B, 64, 64, C), (B, 32, 32, C))


def _setup(rng, n=150):
    feats = tuple(jnp.asarray(rng.randn(*s), jnp.float32) for s in SHAPES)
    yx = rng.rand(n, 2) * 0.7
    hw = rng.rand(n, 2) * 0.2 + 0.02
    boxes = jnp.asarray(
        np.concatenate([yx, np.minimum(yx + hw, 1.0)], 1).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, B, n).astype(np.int32))
    lvl = jnp.clip(assign_fpn_level(boxes, (IMAGE, IMAGE)) - 2, 0, 3)
    return feats, boxes, bidx, lvl


@pytest.mark.parametrize("crop", [(7, 7), (14, 14)])
def test_bwd_matches_xla_transpose_on_fit_boxes(rng, crop):
    feats, boxes, bidx, lvl = _setup(rng)
    n = boxes.shape[0]
    heights = jnp.array([s[1] for s in SHAPES], jnp.int32)
    widths = jnp.array([s[2] for s in SHAPES], jnp.int32)
    _, _, fits = window_origins_and_fits(
        boxes, lvl, heights, widths, crop, (32, 32))
    assert 0 < int(np.asarray(fits).sum()) < n  # both classes present
    g = jnp.asarray(rng.randn(n, *crop, C).astype(np.float32))
    # unfit boxes' window values are tap-truncated (a DIFFERENT linear map
    # than the full gather) — parity holds exactly on the fit subset
    gz = g * np.asarray(fits)[:, None, None, None]

    def fwd(fs):
        return multilevel_crop_and_resize(
            list(fs), boxes, bidx, crop, (1, 1), level_idx=lvl)

    (ref,) = jax.linear_transpose(fwd, feats)(gz)
    got = multilevel_roi_align_window_bwd(
        gz, boxes, bidx, lvl, SHAPES, crop, (32, 32), interpret=True)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)


def test_multi_strip_spill_rows_receive_gradient(rng):
    """A box whose window straddles the strip boundary of the multi-strip
    P2 level (rows 128..159 with strip_h=128) must land its full gradient —
    the halo-spill overlap-add path."""
    feats, _, _, _ = _setup(rng, n=4)
    # y0 will be ~row 120 of P2: window rows 120..151 cross the boundary
    y1 = 120.5 / 255.0
    boxes = jnp.asarray([[y1, 0.2, y1 + 20 / 255.0, 0.28]], jnp.float32)
    bidx = jnp.zeros(1, jnp.int32)
    lvl = jnp.zeros(1, jnp.int32)
    g = jnp.ones((1, 7, 7, C), jnp.float32)

    def fwd(fs):
        return multilevel_crop_and_resize(
            list(fs), boxes, bidx, (7, 7), (1, 1), level_idx=lvl)

    (ref,) = jax.linear_transpose(fwd, feats)(g)
    got = multilevel_roi_align_window_bwd(
        g, boxes, bidx, lvl, SHAPES, (7, 7), (32, 32), interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0, atol=1e-4)
    # the gradient genuinely crosses the strip boundary
    assert float(jnp.abs(got[0][:, 128:]).sum()) > 0
    assert float(jnp.abs(got[0][:, :128]).sum()) > 0


class TestSupportGuard:
    def test_flagship_shapes_supported(self):
        assert bwd_kernel_supported(SHAPES, (32, 32))

    def test_non_divisible_strips_fall_back(self):
        shapes = ((B, 192, 256, C),) + SHAPES[1:]
        assert not bwd_kernel_supported(shapes, (32, 32))

    def test_vmem_budget_falls_back(self):
        big = tuple((B, h, w, 256) for (_, h, w, _) in
                    ((0, 512, 512, 0), (0, 256, 256, 0),
                     (0, 128, 128, 0), (0, 64, 64, 0)))
        assert not bwd_kernel_supported(big, (64, 64))

    def test_small_maps_fall_back(self):
        shapes = ((B, 16, 16, C),) + SHAPES[1:]
        assert not bwd_kernel_supported(shapes, (32, 32))
