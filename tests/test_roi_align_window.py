"""Window-DMA Pallas RoIAlign (ops/roi_align_window.py) vs the production
XLA gather — interpret-mode parity (the kernel-correctness idiom of
SURVEY.md §4; hardware timing lives in scripts/profile_roi_window.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.roi_align import (
    assign_fpn_level, multilevel_crop_and_resize)
from feature_intertwiner_tpu.ops.roi_align_window import (
    multilevel_roi_align_window)

IMAGE = 256


def _pyramid(rng, b=2, c=64):
    return [jnp.asarray(rng.randn(b, s, s, c), jnp.float32)
            for s in (64, 32, 32, 32)]


def _boxes(rng, n, b=2, max_hw=0.25):
    yx = rng.rand(n, 2) * 0.7
    hw = rng.rand(n, 2) * max_hw + 0.02
    boxes = np.concatenate([yx, yx + hw], 1).astype(np.float32)
    bidx = rng.randint(0, b, n).astype(np.int32)
    lvl = np.asarray(assign_fpn_level(jnp.asarray(boxes), (IMAGE, IMAGE))) - 2
    return (jnp.asarray(boxes), jnp.asarray(bidx),
            jnp.asarray(np.clip(lvl, 0, 3).astype(np.int32)))


@pytest.mark.parametrize("crop", [(7, 7), (14, 14)])
def test_window_kernel_matches_xla_gather(rng, crop):
    feats = _pyramid(rng)
    boxes, bidx, lvl = _boxes(rng, 96)
    ref = multilevel_crop_and_resize(feats, boxes, bidx, crop,
                                     (IMAGE, IMAGE), level_idx=lvl)
    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, crop, window=(32, 32), box_tile=32,
        interpret=True)
    fits = np.asarray(fits)
    assert fits.all()  # bounded boxes at their eqn-1 level all fit 32x32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_window_kernel_flags_oversized_boxes(rng):
    feats = _pyramid(rng)
    # a full-image box forced onto P2 (level 0): 64-cell span > 32 window
    boxes = jnp.asarray([[0.01, 0.01, 0.99, 0.99], [0.1, 0.1, 0.2, 0.2]],
                        jnp.float32)
    bidx = jnp.zeros(2, jnp.int32)
    lvl = jnp.zeros(2, jnp.int32)
    boxes = jnp.tile(boxes, (16, 1))
    bidx = jnp.tile(bidx, 16)
    lvl = jnp.tile(lvl, 16)
    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 32), box_tile=32,
        interpret=True)
    fits = np.asarray(fits)
    assert not fits[0] and fits[1]
    # the fitting box is still exact
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got)[fits], np.asarray(ref)[fits],
                               rtol=0, atol=5e-5)


def test_window_kernel_pads_nonmultiple_box_counts(rng):
    feats = _pyramid(rng)
    boxes, bidx, lvl = _boxes(rng, 50)  # not a multiple of box_tile
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 32), box_tile=32,
        interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got)[np.asarray(fits)],
                               np.asarray(ref)[np.asarray(fits)],
                               rtol=0, atol=5e-5)


def test_hybrid_is_exact_including_oversized_boxes(rng):
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    feats = _pyramid(rng)
    boxes, bidx, lvl = _boxes(rng, 60)
    # splice in oversized boxes (span > 32 cells at their level)
    big = jnp.asarray([[0.01, 0.01, 0.99, 0.99]] * 4, jnp.float32)
    boxes = jnp.concatenate([boxes[:60], big], 0)
    bidx = jnp.concatenate([bidx[:60], jnp.zeros(4, jnp.int32)])
    lvl = jnp.concatenate([lvl[:60], jnp.zeros(4, jnp.int32)])
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    got = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (IMAGE, IMAGE), level_idx=lvl,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_hybrid_gradient_matches_xla_path(rng):
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    feats = _pyramid(rng, b=1, c=32)
    boxes, bidx, lvl = _boxes(rng, 16, b=1)
    cot = jnp.asarray(rng.randn(16, 7, 7, 32), jnp.float32)

    def loss_win(fs):
        out = multilevel_crop_and_resize_window(
            fs, boxes, bidx, (7, 7), (IMAGE, IMAGE), level_idx=lvl,
            interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(fs):
        out = multilevel_crop_and_resize(list(fs), boxes, bidx, (7, 7),
                                         (IMAGE, IMAGE), level_idx=lvl)
        return jnp.sum(out * cot)

    g_win = jax.grad(loss_win)(tuple(feats))
    g_xla = jax.grad(loss_xla)(tuple(feats))
    for a, b in zip(g_win, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)


def test_right_edge_boxes_on_nonmultiple_of_8_maps(rng):
    """Regression, round 4 then strengthened in round 5: on levels whose
    width is not a multiple of 8 (e.g. 1088 -> P5 34 wide, 800 -> P3 100
    wide), clipping the x-origin to dim-span and re-aligning it down used
    to slide the window LEFT of the span the fit test validated. Since
    phys_widths_for rounds physical widths up to the 8-cell sublane tile,
    the clamp bound is itself aligned and right-edge boxes FIT and match
    the exact XLA gather (the fit test still uses the final origin as a
    safety net)."""
    feats = [jnp.asarray(rng.randn(1, s, s, 16), jnp.float32)
             for s in (68, 34, 34, 34)]
    # P5 (34 wide): sample cells [27..33] — the window DMA now reaches
    # them via the 40-wide padded buffer (origin 8, cols 34-39 zeros)
    edge = jnp.asarray([[0.3, 27.0 / 33.0, 0.5, 1.0]], jnp.float32)
    boxes = jnp.tile(edge, (8, 1))
    bidx = jnp.zeros(8, jnp.int32)
    lvl = jnp.full((8,), 3, jnp.int32)
    got_k, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 32), box_tile=8,
        interpret=True)
    assert np.asarray(fits).all()
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (1088, 1088), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref),
                               rtol=0, atol=5e-5)
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)
    got = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (1088, 1088), level_idx=lvl,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_packed_field_guards_fall_back(rng):
    """batch > 64 overflows the 6-bit batch field of the packed scalar
    word; the wrapper must route such shapes to the exact XLA path (same
    for n == 0, which the kernel cannot tile)."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    feats = [jnp.asarray(rng.randn(65, 32, 32, 8), jnp.float32)
             for _ in range(4)]
    boxes, bidx, lvl = _boxes(rng, 12, b=65)
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (256, 256), level_idx=lvl)
    got = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (256, 256), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=0)
    empty = multilevel_crop_and_resize_window(
        feats, boxes[:0], bidx[:0], (7, 7), (256, 256), level_idx=lvl[:0])
    assert empty.shape == (0, 7, 7, 8)


def test_upsampled_maps_need_scaled_window(rng):
    """The dev path pools from upsample_fac-x maps, doubling every box's
    cell span: boxes that fit a 32-window on the base maps overflow it on
    2x maps, but fit (and match XLA exactly) with a fac-scaled 64-window —
    the scaling models/intertwiner.py applies when roi_window_kernel is on."""
    base = [jnp.asarray(rng.randn(1, s, s, 16), jnp.float32)
            for s in (64, 32, 32, 32)]
    ups = [jax.image.resize(f, (1, f.shape[1] * 2, f.shape[2] * 2, 16),
                            "bilinear") for f in base]
    # spans of ~20 cells on P2 (64 wide): fit 32 on base, 40 > 32 on 2x maps
    yx = rng.rand(16, 2) * 0.6
    boxes = jnp.asarray(np.concatenate([yx, yx + 0.32], 1), np.float32)
    bidx = jnp.zeros(16, jnp.int32)
    lvl = jnp.zeros(16, jnp.int32)
    _, fits32 = multilevel_roi_align_window(
        ups, boxes, bidx, lvl, (14, 14), window=(32, 32), box_tile=16,
        interpret=True)
    assert not np.asarray(fits32).any()
    got, fits64 = multilevel_roi_align_window(
        ups, boxes, bidx, lvl, (14, 14), window=(64, 64), box_tile=16,
        interpret=True)
    assert np.asarray(fits64).all()
    ref = multilevel_crop_and_resize(ups, boxes, bidx, (14, 14),
                                     (512, 512), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_hybrid_small_map_guard_falls_back(rng):
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    # P5-like 10x10 map < 32x32 window -> pure XLA path, bit-identical
    feats = [jnp.asarray(rng.randn(1, s, s, 16), jnp.float32)
             for s in (40, 20, 10, 10)]
    boxes, bidx, lvl = _boxes(rng, 8, b=1)
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (160, 160), level_idx=lvl)
    got = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (160, 160), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=0)


# ---------------------------------------------------------------------------
# unfit-overflow counter (VERDICT r3 #3: the hybrid's silent-degradation
# channel must be instrumented, and production shapes must keep it at zero)
# ---------------------------------------------------------------------------
class TestUnfitOverflow:
    def test_zero_when_all_boxes_fit(self, rng):
        from feature_intertwiner_tpu.ops.roi_align_window import (
            hybrid_unfit_overflow)
        feats = _pyramid(rng)
        boxes, _, lvl = _boxes(rng, 96)
        ov = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 32))
        assert int(ov) == 0

    def test_counts_unfit_beyond_fallback_budget(self, rng):
        from feature_intertwiner_tpu.ops.roi_align_window import (
            hybrid_unfit_overflow)
        feats = _pyramid(rng)
        # 200 full-image boxes forced onto P2: every sample grid spans 64
        # cells > the 32 window, fallback_k = max(8, 200//16) = 12
        boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
                         (200, 1))
        lvl = jnp.zeros(200, jnp.int32)
        ov = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 32))
        assert int(ov) == 200 - 12

    def test_zero_when_wrapper_routes_to_xla(self, rng):
        # guard parity: maps smaller than the window make the production
        # wrapper fall back to the exact XLA path entirely, so no value is
        # ever tap-truncated and the counter must agree
        from feature_intertwiner_tpu.ops.roi_align_window import (
            hybrid_unfit_overflow)
        feats = [jnp.zeros((1, s, s, 8)) for s in (16, 8, 4, 4)]
        boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
                         (64, 1))
        lvl = jnp.zeros(64, jnp.int32)
        ov = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 32))
        assert int(ov) == 0

    @staticmethod
    def _boxes_with_aspect(rng, n, img, ratio_max):
        """sqrt-area log-uniform over [8px, img], aspect log-uniform up to
        ratio_max — a geometry sweep wider than anchors (ratio<=2) emit."""
        sa = np.exp(rng.uniform(np.log(8 / img), 0.0, n))
        r = np.exp(rng.uniform(-np.log(ratio_max), np.log(ratio_max), n))
        h = np.minimum(sa * np.sqrt(r), 1.0)
        w = np.minimum(sa / np.sqrt(r), 1.0)
        yx = rng.rand(n, 2) * np.stack([1 - h, 1 - w], 1)
        return jnp.asarray(np.concatenate(
            [yx, yx + np.stack([h, w], 1)], 1).astype(np.float32))

    def test_production_shapes_stay_at_zero(self, rng):
        """The flagship regime (1024² maps, eqn-1 level assignment, the
        window scaling models/intertwiner.py applies for UPSAMPLE_FAC=2)
        keeps the counter at 0 across production-like geometry: eqn-1
        ASSIGNS levels by box size, so a box's span in its own level's
        cells is bounded by its aspect ratio — with aspect <= 4 (double the
        widest anchor) the unfit rate measures <=6%, inside the hybrid's
        n/16 exact-fallback budget."""
        from feature_intertwiner_tpu.ops.roi_align_window import (
            hybrid_unfit_overflow)
        img = 1024
        boxes = self._boxes_with_aspect(rng, 2048, img, ratio_max=4.0)
        lvl = jnp.clip(assign_fpn_level(boxes, (img, img)) - 2, 0, 3)
        for fac, window in ((1.0, 32), (2.0, 64)):
            sizes = [int(img // s * fac) for s in (4, 8, 16, 32)]
            feats = [jnp.zeros((1, s, s, 4)) for s in sizes]
            for crop in (7, 14):
                ov = hybrid_unfit_overflow(
                    feats, boxes, lvl, (crop, crop), (window, window))
                assert int(ov) == 0, (fac, crop, int(ov))

    def test_counter_fires_on_distribution_shift(self, rng):
        """The silent-degradation scenario VERDICT r3 #3 names: a geometry
        shift (here extreme aspect ratios, which eqn-1 assignment cannot
        bound) pushes the unfit count past the exact-fallback budget — the
        counter must go POSITIVE, not stay silently at zero."""
        from feature_intertwiner_tpu.ops.roi_align_window import (
            hybrid_unfit_overflow)
        img = 1024
        boxes = self._boxes_with_aspect(rng, 2048, img, ratio_max=64.0)
        lvl = jnp.clip(assign_fpn_level(boxes, (img, img)) - 2, 0, 3)
        feats = [jnp.zeros((1, img // s, img // s, 4))
                 for s in (4, 8, 16, 32)]
        ov = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 32))
        assert int(ov) > 0

    def test_dev_module_sows_diagnostics(self, rng):
        """Dev surfaces the counter via the 'diagnostics' collection when
        the window kernel is on (harvested into metrics by train/step.py
        and test_model)."""
        from feature_intertwiner_tpu.models.intertwiner import Dev
        feats = [jnp.asarray(rng.randn(1, s, s, 32), jnp.float32)
                 for s in (64, 32, 16, 8)]
        rois = jnp.asarray(rng.rand(1, 16, 4).astype(np.float32) * 0.3)
        rois = rois.at[:, :, 2:].add(rois[:, :, :2] + 0.05)
        dev = Dev(num_classes=8, pool_size=7, mask_pool_size=14,
                  feat_pool_size=14, image_size=256, use_dev=False,
                  roi_window_kernel=True, roi_window=8)
        vars_ = dev.init({"params": jax.random.PRNGKey(0)}, feats, rois)
        (_, _, _), mutated = dev.apply(
            vars_, feats, rois, mutable=["diagnostics"])
        diag = mutated["diagnostics"]
        leaves = jax.tree_util.tree_leaves(diag)
        assert leaves, "no diagnostics sown"
        assert int(leaves[0]) >= 0


def test_rect_window_pads_narrow_levels_and_fits_giant_boxes(rng):
    """The production-audit regression (round 4): near-full-image boxes at
    their FPN-assigned top level must FIT the rectangular default window —
    the x-span (+8 over the side) absorbs the sublane-align origin loss,
    and levels narrower than the span are zero-padded internally (P5 at
    1024² is exactly as wide as the square side). Values must match the
    exact XLA gather, and the hybrid must report zero overflow."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        hybrid_unfit_overflow, multilevel_crop_and_resize_window)

    feats = _pyramid(rng)  # P5 map is 32 cells = the square window side
    n = 24
    # giant boxes: 60-98% of the image, moderate aspect ratios
    size = rng.rand(n) * 0.38 + 0.6
    ar = np.exp(rng.uniform(np.log(0.7), np.log(1.4), n))
    h = np.clip(size * np.sqrt(ar), 0.05, 0.98)
    w = np.clip(size / np.sqrt(ar), 0.05, 0.98)
    y1 = rng.rand(n) * (1 - h)
    x1 = rng.rand(n) * (1 - w)
    boxes = jnp.asarray(np.stack([y1, x1, y1 + h, x1 + w], 1), np.float32)
    bidx = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
    # force the top level (at full 1024² production scale the FPN assigner
    # sends these boxes there; the 256² test pyramid only reaches P4)
    lvl = jnp.full((n,), 3, jnp.int32)

    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 40), box_tile=8,
        interpret=True)
    assert np.asarray(fits).all(), "giant top-level boxes must fit (32, 40)"
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)
    ov = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), window=(32, 40))
    assert int(ov) == 0

    # and the hybrid's gradient agrees with the XLA path through the
    # padded top level (the bwd kernel scatters into padded buffers)
    def via_hybrid(fs):
        out = multilevel_crop_and_resize_window(
            fs, boxes, bidx, (7, 7), (IMAGE, IMAGE), level_idx=lvl,
            window=(32, 40), interpret=True)
        return jnp.sum(out * out)

    def via_xla(fs):
        out = multilevel_crop_and_resize(
            list(fs), boxes, bidx, (7, 7), (IMAGE, IMAGE), level_idx=lvl)
        return jnp.sum(out * out)

    g_h = jax.grad(via_hybrid)(feats)
    g_x = jax.grad(via_xla)(feats)
    for a, b in zip(g_h, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)


def test_eval_classifier_budget_matches_train_with_shape_classes(rng):
    """Both train and eval pooling budget n//16 of exact-XLA fallback;
    the eval classifier additionally runs the SHAPE CLASSES (round 4's
    n//4 eval budget is retired — VERDICT r4 #3). Full-image boxes forced
    onto P2 span 64 cells and fit no class, so the counter sees them
    identically in both modes."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        hybrid_unfit_overflow)
    feats = _pyramid(rng)
    # 320 unfit boxes (full-image forced onto P2)
    boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
                     (320, 1))
    lvl = jnp.zeros(320, jnp.int32)
    ov_train = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 40),
                                     fallback_div=16)
    ov_eval = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 40),
                                    fallback_div=16, shape_classes=True)
    assert int(ov_train) == 320 - 320 // 16
    assert int(ov_eval) == 320 - 320 // 16


# ---------------------------------------------------------------------------
# shape-classed windows + resolution generality (VERDICT r4 #3)
# ---------------------------------------------------------------------------
def test_shape_class_windows_derivation():
    from feature_intertwiner_tpu.ops.roi_align_window import (
        shape_class_windows)
    assert shape_class_windows((32, 40)) == ((32, 40), (16, 72), (64, 24))
    for w in shape_class_windows((8, 16)):
        assert w[1] % 8 == 0, w


def test_shape_classes_pool_extreme_aspects_in_kernel(rng):
    """Wide-flat and tall-thin boxes that overflow the primary (32, 40)
    window must fit a shape class and pool EXACTLY in-kernel (not via the
    fallback: fits must be True for every box)."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        shape_class_windows)

    feats = _pyramid(rng)
    n = 16
    # on P2 (64 cells): wide 10x56 cells, tall 56x10 cells, plus square 20s
    wide = np.stack([np.full(n, 0.1), np.full(n, 0.05),
                     np.full(n, 0.1 + 10 / 64), np.full(n, 0.05 + 56 / 64)],
                    1)
    tall = np.stack([np.full(n, 0.05), np.full(n, 0.2),
                     np.full(n, 0.05 + 56 / 64), np.full(n, 0.2 + 10 / 64)],
                    1)
    sq = np.stack([np.full(n, 0.3), np.full(n, 0.3),
                   np.full(n, 0.3 + 20 / 64), np.full(n, 0.3 + 20 / 64)], 1)
    boxes = jnp.asarray(np.concatenate([wide, tall, sq]).astype(np.float32))
    bidx = jnp.zeros(3 * n, jnp.int32)
    lvl = jnp.zeros(3 * n, jnp.int32)

    _, fits_single = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 40), box_tile=16,
        interpret=True)
    fits_single = np.asarray(fits_single)
    assert not fits_single[:2 * n].any(), "extremes must overflow (32, 40)"
    assert fits_single[2 * n:].all()

    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7),
        windows=shape_class_windows((32, 40)), box_tile=16, interpret=True)
    assert np.asarray(fits).all(), "every box must fit some shape class"
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_shape_classed_hybrid_exact_with_minimal_fallback(rng):
    """The hybrid with shape classes on must be exact for an extreme-aspect
    mix even at the n//16 fallback budget (the classes absorb what round 4
    needed n//4 of gather fallback for)."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    feats = _pyramid(rng)
    boxes, bidx, lvl = _boxes(rng, 48)
    wide = jnp.asarray([[0.1, 0.05, 0.1 + 10 / 64, 0.05 + 56 / 64]] * 8,
                       jnp.float32)
    tall = jnp.asarray([[0.05, 0.2, 0.05 + 56 / 64, 0.2 + 10 / 64]] * 8,
                       jnp.float32)
    boxes = jnp.concatenate([boxes, wide, tall])
    bidx = jnp.concatenate([bidx, jnp.zeros(16, jnp.int32)])
    lvl = jnp.concatenate([lvl, jnp.zeros(16, jnp.int32)])
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (IMAGE, IMAGE), level_idx=lvl)
    got = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (IMAGE, IMAGE), level_idx=lvl,
        fallback_div=16, shape_classes=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_resolution_general_kernel_at_800_scale(rng):
    """The 800-scale pyramid (P5 = 25 < the 32-cell window side) must run
    the kernel with internally Y/X-padded maps, not silently drop to the
    gather path (the round-4 gap: TEST.MULTI_SCALE's 800 pass ran off the
    production kernel). Boxes at eqn-1 levels keep scale-invariant cell
    footprints, so they fit the same (32, 40) window."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        _window_path_active, multilevel_crop_and_resize_window)

    img = 800
    feats = [jnp.asarray(rng.randn(1, s, s, 32), jnp.float32)
             for s in (200, 100, 50, 25)]
    assert _window_path_active(feats, ((32, 40),)), (
        "800-scale pyramid must keep the window path active")
    # aspect <= 2 (the anchor band): the (32, 40) fit guarantee covers
    # bounded aspects; extreme shapes are the shape classes' job
    sa = np.exp(rng.uniform(np.log(0.03), np.log(0.5), 64))
    r = np.exp(rng.uniform(-np.log(2.0), np.log(2.0), 64))
    h = np.minimum(sa * np.sqrt(r), 0.95)
    w = np.minimum(sa / np.sqrt(r), 0.95)
    yx = rng.rand(64, 2) * np.stack([1 - h, 1 - w], 1)
    boxes = jnp.asarray(np.concatenate(
        [yx, yx + np.stack([h, w], 1)], 1).astype(np.float32))
    bidx = jnp.zeros(64, jnp.int32)
    lvl = jnp.clip(assign_fpn_level(boxes, (img, img)) - 2, 0, 3)
    got, fits = multilevel_roi_align_window(
        feats, boxes, bidx, lvl, (7, 7), window=(32, 40), box_tile=32,
        interpret=True)
    assert np.asarray(fits).all()
    ref = multilevel_crop_and_resize(feats, boxes, bidx, (7, 7),
                                     (img, img), level_idx=lvl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)
    # and through the full hybrid (shape classes on, the eval-path config)
    got2 = multilevel_crop_and_resize_window(
        feats, boxes, bidx, (7, 7), (img, img), level_idx=lvl,
        shape_classes=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_hybrid_gradient_exact_on_y_padded_pyramid(rng):
    """At image sizes whose P5 is shorter than the window side (e.g. 800²)
    the forward runs the kernel on Y-padded maps while the strip-tiled
    backward is unsupported (bwd_kernel_supported requires H >= sy) — the
    hybrid must fall back to the exact XLA transpose and match the gather
    path's gradient."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        multilevel_crop_and_resize_window)

    img = 800
    feats = [jnp.asarray(rng.randn(1, s, s, 16), jnp.float32)
             for s in (200, 100, 50, 25)]
    boxes, bidx, lvl = _boxes(rng, 16, b=1)
    cot = jnp.asarray(rng.randn(16, 7, 7, 16), jnp.float32)

    def loss_win(fs):
        out = multilevel_crop_and_resize_window(
            fs, boxes, bidx, (7, 7), (img, img), level_idx=lvl,
            interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(fs):
        out = multilevel_crop_and_resize(list(fs), boxes, bidx, (7, 7),
                                         (img, img), level_idx=lvl)
        return jnp.sum(out * cot)

    g_win = jax.grad(loss_win)(tuple(feats))
    g_xla = jax.grad(loss_xla)(tuple(feats))
    for a, b in zip(g_win, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)


def test_window_path_active_for_image_thresholds():
    """The eval loop's per-scale log predicate: every production
    TEST.MULTI_SCALE scale runs the kernel; tiny images drop to gather
    (base map under twice the window side)."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        window_path_active_for_image)
    for s in (800, 1024, 1280):
        assert window_path_active_for_image(s, 32), s
    for s in (96, 128, 240):
        assert not window_path_active_for_image(s, 32), s
    # the dryrun geometry: 256² with an 8-cell window is active
    assert window_path_active_for_image(256, 8)


def test_overflow_counter_shrinks_with_shape_classes(rng):
    """On an extreme-aspect mix the any-class fit must strictly beat the
    single-window fit — the mechanism that lets the eval budget shrink."""
    from feature_intertwiner_tpu.ops.roi_align_window import (
        hybrid_unfit_overflow)
    img = 1024
    boxes = TestUnfitOverflow._boxes_with_aspect(rng, 2048, img,
                                                 ratio_max=64.0)
    lvl = jnp.clip(assign_fpn_level(boxes, (img, img)) - 2, 0, 3)
    feats = [jnp.zeros((1, img // s, img // s, 4)) for s in (4, 8, 16, 32)]
    ov_single = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 40))
    ov_classed = hybrid_unfit_overflow(feats, boxes, lvl, (7, 7), (32, 40),
                                       shape_classes=True)
    assert int(ov_classed) < int(ov_single)
