"""Differential parity tests against the reference implementation ITSELF.

The rest of the suite pins behavior against independently re-derived numpy
oracles and golden values. These tests go one step further: they import the
reference's pure-Python/torch functions read-only from ``/root/reference``
(CPU torch, with minimal shims for torch-0.3-era idioms) and run them on the
SAME inputs as our TPU-native implementations — so parity is checked against
the actual reference code, not a re-derivation of it. No reference code is
copied; it is executed in place. All tests skip when the reference tree is
absent.

Shims (test-scoped, restored afterwards):
- ``torch.Tensor.cuda`` becomes a no-op (the reference hard-codes ``.cuda()``
  inside functions, tools/box_utils.py:112, lib/layers.py:846);
- ``torch.Tensor.data`` gains 0-dim integer indexing (`t.data[0]` was legal
  scalar access in torch 0.3, lib/layers.py:863 etc.);
- the three native-op packages and ``past.builtins`` are stubbed so
  ``lib.layers`` / ``lib.config`` import without the CUDA build.
"""

import contextlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lib")),
    reason="reference tree not available",
)


@contextlib.contextmanager
def _old_torch():
    """torch-0.3 compatibility window for running reference code.

    - ``.cuda()`` becomes a no-op;
    - ``.data`` returns a plain detached tensor (indexable, usable as an
      index — ``proposals[pos_ind.data, :]``, layers.py:278);
    - ``t[0]`` on a 0-dim tensor returns the python scalar (``t.data[0]``
      was legal scalar access in torch 0.3, lib/layers.py:863 etc.).
    """
    import torch

    orig_cuda = torch.Tensor.cuda
    orig_getitem = torch.Tensor.__getitem__
    torch.Tensor.cuda = lambda self, *a, **k: self

    def getitem(self, key):
        if self.dim() == 0 and isinstance(key, int) and key == 0:
            return self.item()
        return orig_getitem(self, key)

    torch.Tensor.__getitem__ = getitem
    torch.Tensor.data = property(lambda self: self.detach())
    try:
        yield torch
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.__getitem__ = orig_getitem
        del torch.Tensor.data


@pytest.fixture(scope="module")
def ref():
    """Imports the reference's pure-Python modules (with import stubs)."""
    stubs = {
        "lib.roi_align.crop_and_resize": {"CropAndResizeFunction": object},
        "lib.roi_pooling.functions.roi_pool": {"RoIPoolFunction": object},
        "lib.nms.nms_wrapper": {"nms": lambda *a, **k: None},
        "past": {},
        "past.builtins": {"basestring": str},
    }
    inserted = []
    for name, attrs in stubs.items():
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            inserted.append(name)
    sys.path.append(REF)
    try:
        import lib.config as ref_config
        import lib.layers as ref_layers
        import lib.OT_module as ref_ot
        import tools.box_utils as ref_boxes
        import tools.image_utils as ref_image_utils

        yield types.SimpleNamespace(
            boxes=ref_boxes, layers=ref_layers, ot=ref_ot,
            image_utils=ref_image_utils, config=ref_config)
    finally:
        sys.path.remove(REF)
        for name in inserted:
            del sys.modules[name]


def _t(x):
    import torch

    return torch.as_tensor(np.asarray(x))


def _rand_boxes(rng, *shape, size=200.0):
    """[..., 4] y1x1y2x2 with strictly positive height/width."""
    lo = rng.uniform(0, size, shape + (2,))
    hw = rng.uniform(1.0, size / 4, shape + (2,))
    return np.concatenate([lo, lo + hw], axis=-1).astype(np.float32)


# ---------------------------------------------------------------- box math


def test_apply_box_deltas_matches_reference(ref, rng):
    from feature_intertwiner_tpu.ops import boxes as ours

    b = _rand_boxes(rng, 2, 40)
    d = (rng.randn(2, 40, 4) * 0.1).astype(np.float32)
    want = ref.boxes.apply_box_deltas(_t(b), _t(d)).numpy()
    got = np.asarray(ours.decode(b, d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_clip_boxes_matches_reference(ref, rng):
    from feature_intertwiner_tpu.ops import boxes as ours

    b = (_rand_boxes(rng, 2, 40, size=300.0) - 20.0).astype(np.float32)
    window = np.array([0.0, 0.0, 256.0, 256.0], np.float32)
    with _old_torch():
        want = ref.boxes.clip_boxes(_t(b), _t(window)).numpy()
    got = np.asarray(ours.clip(b, window))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_box_refinement_matches_reference(ref, rng):
    from feature_intertwiner_tpu.ops import boxes as ours

    b = _rand_boxes(rng, 30)
    g = _rand_boxes(rng, 30)
    want = ref.boxes.box_refinement(_t(b), _t(g)).numpy()
    got = np.asarray(ours.encode(b, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_matrix_matches_reference(ref, rng):
    from feature_intertwiner_tpu.ops import boxes as ours

    b1 = _rand_boxes(rng, 25)
    b2 = _rand_boxes(rng, 17)
    with _old_torch():
        want = ref.boxes.bbox_overlaps(_t(b1), _t(b2)).numpy()
    got = np.asarray(ours.iou_matrix(b1, b2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_extract_bboxes_matches_reference(ref, rng):
    from feature_intertwiner_tpu.ops import boxes as ours

    masks = (rng.rand(32, 32, 6) > 0.9).astype(np.float32)
    masks[..., -1] = 0.0  # empty-mask branch
    want = ref.boxes.extract_bboxes(masks)
    got = np.asarray(ours.boxes_from_masks(masks.transpose(2, 0, 1)))
    np.testing.assert_array_equal(got, want)


# ----------------------------------------------------------------- anchors


def test_pyramid_anchors_match_reference(ref):
    from feature_intertwiner_tpu.ops import anchors as ours

    scales = (32, 64, 128, 256, 512)
    ratios = [0.5, 1, 2]
    shapes = [[64, 64], [32, 32], [16, 16], [8, 8], [4, 4]]
    strides = [4, 8, 16, 32, 64]
    want = ref.layers.generate_pyramid_priors(scales, ratios, shapes,
                                              strides, 1)
    got = ours.generate_pyramid_anchors(scales, ratios, shapes, strides, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


# ------------------------------------------------------------------ losses


def test_rpn_class_loss_matches_reference(ref, rng):
    from feature_intertwiner_tpu.train import losses as ours

    match = rng.choice([-1, 0, 1], size=(3, 60), p=[0.3, 0.5, 0.2])
    logits = rng.randn(3, 60, 2).astype(np.float32)
    want = ref.layers.compute_rpn_class_loss(
        _t(match.astype(np.int64)), _t(logits)).item()
    got = float(ours.rpn_class_loss(match, logits))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rpn_bbox_loss_matches_reference(ref, rng):
    from feature_intertwiner_tpu.train import losses as ours

    bs, na, cap = 3, 60, 32
    match = rng.choice([-1, 0, 1], size=(bs, na), p=[0.3, 0.5, 0.2])
    dense_target = rng.randn(bs, na, 4).astype(np.float32)
    pred = rng.randn(bs, na, 4).astype(np.float32)
    # the reference consumes the positives packed per sample in anchor order
    # (prepare_rpn_target packs them that way, lib/layers.py:648-652)
    packed = np.zeros((bs, cap, 4), np.float32)
    for i in range(bs):
        pos = np.where(match[i] == 1)[0]
        packed[i, : len(pos)] = dense_target[i, pos]
    with _old_torch():
        want = ref.layers.compute_rpn_bbox_loss(
            _t(packed), _t(match.astype(np.int64)), _t(pred)).item()
    got = float(ours.rpn_bbox_loss(dense_target, match, pred))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mrcnn_class_loss_matches_reference(ref, rng):
    from feature_intertwiner_tpu.train import losses as ours

    target = rng.randint(0, 8, size=(2, 20))
    logits = rng.randn(2, 20, 8).astype(np.float32)
    with _old_torch():
        want = ref.layers.compute_mrcnn_class_loss(
            _t(target.astype(np.int64)), _t(logits)).item()
    got = float(ours.mrcnn_class_loss(target, logits))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mrcnn_bbox_loss_matches_reference(ref, rng):
    from feature_intertwiner_tpu.train import losses as ours

    bs, nr, k = 2, 20, 8
    target_cls = rng.randint(0, k, size=(bs, nr))
    target_cls[:, nr // 2:] = 0  # padding/background rows
    target_deltas = rng.randn(bs, nr, 4).astype(np.float32)
    pred = rng.randn(bs, nr, k, 4).astype(np.float32)
    with _old_torch():
        want = ref.layers.compute_mrcnn_bbox_loss(
            _t(target_deltas), _t(target_cls.astype(np.int64)),
            _t(pred)).item()
    got = float(ours.mrcnn_bbox_loss(target_deltas, target_cls, pred))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mrcnn_mask_loss_matches_reference(ref, rng):
    from feature_intertwiner_tpu.train import losses as ours

    bs, nr, k, m = 2, 10, 6, 14
    target_cls = rng.randint(0, k, size=(bs, nr))
    target_cls[:, nr // 2:] = 0
    target_masks = (rng.rand(bs, nr, m, m) > 0.5).astype(np.float32)
    # keep probabilities away from {0,1} so clamping conventions can't differ
    pred = rng.uniform(0.02, 0.98, size=(bs, nr, m, m, k)).astype(np.float32)
    with _old_torch():
        want = ref.layers.compute_mrcnn_mask_loss(
            _t(target_masks), _t(target_cls.astype(np.int64)),
            _t(pred.transpose(0, 1, 4, 2, 3))).item()
    got = float(ours.mrcnn_mask_loss(target_masks, target_cls, pred))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------- Sinkhorn


@pytest.mark.parametrize("form", ["cosine", "l2"])
def test_sinkhorn_matches_reference(ref, rng, form):
    from feature_intertwiner_tpu.ops.sinkhorn import sinkhorn_ot

    n, d = 16, 32
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randn(n, d).astype(np.float32)
    # the reference stores 1/epsilon (OT_module.py:13); OptTrans(epsilon=1)
    # and ours epsilon=1 are the identical kernel K = exp(-C)
    ns = types.SimpleNamespace(epsilon=1.0, C_form=form, L=5, no_bp_P_L=True)
    with _old_torch():
        # unbound call: _sinkhorn_iterate only reads the 4 attrs above —
        # no nn.Module construction needed (and the cosine path mutates its
        # inputs in place, so pass copies)
        want = ref.ot.OptTrans._sinkhorn_iterate(
            ns, _t(x.copy()), _t(y.copy())).item()
    got = float(sinkhorn_ot(x, y, epsilon=1.0, iters=5, cost_form=form))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# -------------------------------------------------------------- image meta


def test_image_meta_roundtrip_matches_reference(ref, rng):
    from feature_intertwiner_tpu.data import transforms as ours

    active = np.zeros(81, np.int32)
    active[rng.choice(81, 10, replace=False)] = 1
    want = ref.image_utils.compose_image_meta(
        7, (768, 1024, 3), (0, 128, 768, 896), active, 4242)
    got = ours.compose_image_meta(7, (768, 1024, 3), (0, 128, 768, 896),
                                  active, 4242)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    r_id, r_shape, r_window, r_active, r_coco = ref.image_utils.parse_image_meta(
        np.asarray(want)[None])
    o_id, o_shape, o_window, o_active, o_coco = ours.parse_image_meta(
        np.asarray(got, np.float32)[None])
    np.testing.assert_array_equal(o_id, r_id)
    np.testing.assert_array_equal(o_shape, r_shape)
    np.testing.assert_array_equal(o_window, r_window)
    np.testing.assert_array_equal(o_active, r_active)
    np.testing.assert_array_equal(o_coco, r_coco)


# ------------------------------------------------------------------ config


#: Intentional default divergences (each documented in PARITY.md / README
#: "Fidelity notes"); everything else must match the reference bit-for-bit.
_CONFIG_DIVERGENCES = {
    # weight files are flax .npz trees, not torch .pth
    ("MODEL", "PRETRAIN_IMAGENET_MODEL"),
    ("MODEL", "PRETRAIN_COCO_MODEL"),
    # derived values the reference only fills at _set_value time
    # (lib/config.py:290-376); our build fills them immediately
    ("MODEL", "BACKBONE_STRIDES"),
    ("MODEL", "BACKBONE_SHAPES"),
    ("DATA", "IMAGE_SHAPE"),
    ("TEST", "BATCH_SIZE"),
    ("CTRL", "CONFIG_NAME"),
    ("CTRL", "PHASE"),
    ("MISC", "RESULT_FOLDER"),
    ("MISC", "DEVICE_ID"),
    ("MISC", "GPU_COUNT"),
    # the reference's default 'alpha' structure is unreachable/crashes
    # (lib/sub_module.py:391, SURVEY.md §3.5 #2); ours defaults to the only
    # working structure
    ("DEV", "STRUCTURE"),
}


def test_config_defaults_match_reference(ref):
    from feature_intertwiner_tpu.config import build_config

    attrdict_cls = type(ref.config.Config.MODEL)
    ours = build_config().to_dict()
    mismatches = []
    for ns, rv_ns in vars(ref.config.Config).items():
        if not isinstance(rv_ns, attrdict_cls):
            continue
        assert ns in ours, f"namespace {ns} missing"
        for key, rv in rv_ns.items():
            assert key in ours[ns], f"{ns}.{key} missing"
            ov = ours[ns][key]
            if isinstance(rv, np.ndarray) or isinstance(ov, np.ndarray):
                same = np.array_equal(np.asarray(rv), np.asarray(ov))
            elif isinstance(rv, (list, tuple)) and isinstance(ov, (list, tuple)):
                same = list(rv) == list(ov)
            else:
                same = rv == ov
            if not same and (ns, key) not in _CONFIG_DIVERGENCES:
                mismatches.append(f"{ns}.{key}: ref={rv!r} ours={ov!r}")
    assert not mismatches, "\n".join(mismatches)
