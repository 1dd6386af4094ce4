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


# ----------------------------------------------- proposal / detection layers


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _novar(t, **kw):
    """torch-0.4+ shim for ``Variable(x, requires_grad=..., volatile=...)``."""
    return t


def _nms_oracle_factory():
    """Replicates ``nms_wrapper.nms`` (lib/nms/nms_wrapper.py:14-35) with the
    numpy greedy oracle: per-sample greedy NMS (+1 convention, strict >,
    matching the CUDA path the reference runs), truncated to the batch-min
    keep count."""
    from test_nms import np_greedy_nms

    def oracle(dets, thresh):
        d = np.asarray(dets.detach() if hasattr(dets, "detach") else dets)
        keep = [np_greedy_nms(d[i, :, :4], d[i, :, 4], thresh)
                for i in range(d.shape[0])]
        m = min(len(k) for k in keep)
        return np.stack([k[:m] for k in keep]).astype(np.int64)

    return oracle


def test_proposal_layer_matches_reference(ref, rng, monkeypatch):
    """Full proposal path (lib/layers.py:71-139) vs ops/proposals.py on the
    same RPN outputs, with the reference's nms monkeypatched to the exact
    greedy oracle (its CUDA extension can't build here)."""
    from feature_intertwiner_tpu.ops.proposals import proposal_layer as ours

    h = w = 128
    anchors = ref.layers.generate_pyramid_priors(
        (16, 32), [0.5, 1, 2], [[16, 16], [8, 8]], [8, 16], 1
    ).astype(np.float32)
    a = anchors.shape[0]
    bs = 2
    fg = rng.rand(bs, a).astype(np.float32)
    probs = np.stack([1.0 - fg, fg], axis=-1)
    deltas = (rng.randn(bs, a, 4) * 0.2).astype(np.float32)
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)

    cfg = _ns(RPN=_ns(PRE_NMS_LIMIT=400),
              DATA=_ns(BBOX_STD_DEV=std, IMAGE_SHAPE=np.array([h, w, 3])))
    monkeypatch.setattr(ref.layers, "nms", _nms_oracle_factory())
    monkeypatch.setattr(ref.layers, "Variable", _novar)
    with _old_torch():
        want = ref.layers.proposal_layer(
            [_t(probs), _t(deltas)], 100, 0.7, _t(anchors),
            config=cfg).numpy()

    got = np.asarray(ours(probs, deltas, anchors, std, (h, w),
                          pre_nms_limit=400, proposal_count=100,
                          nms_threshold=0.7))
    k = want.shape[1]
    assert k > 10
    np.testing.assert_allclose(got[:, :k], want, rtol=1e-4, atol=2e-4)


def test_detection_layer_matches_reference(ref, rng, monkeypatch):
    """Inference detection layer (refine -> clip -> round -> filter ->
    per-class NMS -> top-k; lib/layers.py:664-802) vs ops/detection.py."""
    import torch

    from feature_intertwiner_tpu.ops.detection import detection_layer as ours

    h = w = 256
    r, k, m = 120, 5, 20
    lo = rng.uniform(0.0, 0.75, (r, 2))
    hw = rng.uniform(0.05, 0.2, (r, 2))
    rois = np.concatenate([lo, lo + hw], axis=1).astype(np.float32)
    cls = (np.arange(r) % (k - 1)) + 1
    logits = rng.randn(r, k).astype(np.float32)
    logits[np.arange(r), cls] += 3.0
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    probs = probs.astype(np.float32)
    deltas = (rng.randn(r, k, 4) * 0.1).astype(np.float32)
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
    windows = np.array([[10.0, 8.0, 240.0, 250.0]], np.float32)

    cfg = _ns(
        TEST=_ns(DET_MAX_INSTANCES=m, DET_NMS_THRESHOLD=0.3,
                 DET_MIN_CONFIDENCE=0.4),
        DATA=_ns(BBOX_STD_DEV=std, IMAGE_SHAPE=np.array([h, w, 3])),
        MISC=_ns(GPU_COUNT=0),
    )
    monkeypatch.setattr(ref.layers, "nms", _nms_oracle_factory())
    monkeypatch.setattr(ref.layers, "Variable", _novar)
    # torch-0.3 unique1d concatenates ByteTensor+BoolTensor (illegal in
    # modern torch); torch.unique(sorted=True) is its exact semantics
    monkeypatch.setattr(ref.layers, "unique1d",
                        lambda v: torch.unique(v.reshape(-1), sorted=True))
    with _old_torch():
        want, _ = ref.layers.detection_layer(
            _t(rois[None]), _t(probs), _t(deltas), _t(windows), cfg)
        want = want.numpy()

    got, _, _ = ours(rois[None], probs[None], deltas[None], windows, std,
                     (h, w), max_instances=m, nms_threshold=0.3,
                     min_confidence=0.4)
    got = np.asarray(got)
    assert (want[0, :, 4] > 0).sum() > 5, "test data produced no detections"
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


# --------------------------------------------------------- target assignment


def test_rpn_targets_match_reference(ref, rng, monkeypatch, tmp_path):
    """RPN target assignment (lib/layers.py:439-658) vs ops/targets.py.

    The negative subsample is drawn from different RNG streams (the
    reference uses np.random.permutation), so the comparison is on the
    deterministic parts: the positive set (force-match + >=0.7, no pos
    subsample when <=TRAIN_ANCHORS/2), the packed positive deltas, the
    pos/neg budget split, and crowd exclusion of the sampled negatives."""
    import jax

    from feature_intertwiner_tpu.ops.targets import rpn_targets

    anchors = ref.layers.generate_pyramid_priors(
        (16, 32), [0.5, 1, 2], [[16, 16], [8, 8]], [8, 16], 1
    ).astype(np.float32)
    gt_boxes = np.zeros((6, 4), np.float32)
    gt_boxes[0] = anchors[137]
    gt_boxes[1] = anchors[800]
    gt_boxes[2] = [40.0, 40.0, 90.0, 95.0]
    gt_boxes[3] = [0.0, 0.0, 60.0, 60.0]        # crowd
    gt_boxes[4] = [70.0, 70.0, 128.0, 128.0]    # crowd
    gt_cls = np.array([1, 2, 3, -1, -2, 0], np.float32)  # 3 real, 2 crowd, pad
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)

    cfg = _ns(
        RPN=_ns(TRAIN_ANCHORS_PER_IMAGE=64, TARGET_POS_THRES=0.7,
                TARGET_NEG_THRES=0.3),
        CTRL=_ns(PROFILE_ANALYSIS=False),
        MISC=_ns(LOG_FILE=str(tmp_path / "log.txt")),
        DATA=_ns(BBOX_STD_DEV=std),
    )
    monkeypatch.setattr(ref.layers, "Variable", _novar)
    orig_br = ref.layers.box_refinement
    # torch-0.3 Variable row-indexing kept 2 dims; modern torch gives [4]
    monkeypatch.setattr(
        ref.layers, "box_refinement",
        lambda b, g: orig_br(b.reshape(1, -1) if b.dim() == 1 else b,
                             g.reshape(1, -1) if g.dim() == 1 else g))
    with _old_torch():
        np.random.seed(0)
        want_match, want_bbox = ref.layers.prepare_rpn_target(
            _t(anchors), _t(gt_cls[None]), _t(gt_boxes[None]), cfg,
            curr_coco_im_id=_t(np.array([3])))
        want_match = want_match.numpy()[0]
        want_bbox = want_bbox.numpy()[0]
        crowd_iou = ref.boxes.bbox_overlaps(
            _t(anchors), _t(gt_boxes[3:5])).numpy().max(1)

    out = rpn_targets(jax.random.PRNGKey(0), anchors,
                      gt_cls[None].astype(np.int32), gt_boxes[None], std,
                      train_anchors_per_image=64)
    match = np.asarray(out.match)[0]
    deltas = np.asarray(out.deltas)[0]

    ref_pos = np.where(want_match == 1)[0]
    our_pos = np.where(match == 1)[0]
    assert 2 <= len(ref_pos) <= 32, "test data must avoid the pos subsample"
    assert set(our_pos) == set(ref_pos)
    # packed reference deltas are in ascending positive-anchor order
    np.testing.assert_allclose(deltas[np.sort(our_pos)],
                               want_bbox[:len(our_pos)],
                               rtol=1e-4, atol=1e-4)
    # both fill the budget with negatives
    assert (want_match == -1).sum() == 64 - len(ref_pos)
    assert (match == -1).sum() == 64 - len(our_pos)
    # our sampled negatives obey the crowd exclusion (checked with the
    # reference's own IoU code)
    assert np.all(crowd_iou[match == -1] < 0.001)


def test_detection_targets_match_reference(ref, rng, monkeypatch):
    """Detection target sampling (lib/layers.py:224-433) vs ops/targets.py.

    Positives travel with their RoI box, so the positive (roi -> class,
    delta, mask) mapping is deterministic whenever #pos <= the positive
    quota (both sides then take every positive); negatives differ by RNG
    stream and are compared by count. The reference's CropAndResizeFunction
    is monkeypatched to our crop_and_resize, so the mini-mask coordinate
    transform and rounding are what's under differential test."""
    import jax
    import jax.numpy as jnp
    import torch

    from feature_intertwiner_tpu.ops.roi_align import crop_and_resize
    from feature_intertwiner_tpu.ops.targets import detection_targets

    g, p, r = 8, 64, 48
    mm = 32  # mini-mask resolution
    lo = rng.uniform(0.0, 0.7, (4, 2))
    hw = rng.uniform(0.1, 0.25, (4, 2))
    real = np.concatenate([lo, lo + hw], axis=1).astype(np.float32)
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_boxes[:4] = real
    gt_boxes[4] = [0.05, 0.05, 0.2, 0.2]    # crowd (small: keeps negs eligible)
    gt_boxes[5] = [0.75, 0.75, 0.95, 0.95]  # crowd
    gt_cls = np.array([1, 2, 3, 2, -1, -3, 0, 0], np.float32)
    gt_masks = (rng.rand(g, mm, mm) > 0.5).astype(np.float32)

    jit = np.clip(
        np.repeat(real, 2, axis=0) + rng.randn(8, 4).astype(np.float32) * 0.01,
        0.0, 1.0)
    lo2 = rng.uniform(0.0, 0.75, (p - 8, 2))
    hw2 = rng.uniform(0.05, 0.2, (p - 8, 2))
    props = np.concatenate(
        [jit, np.concatenate([lo2, lo2 + hw2], 1)]).astype(np.float32)
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)

    class _CRShim:
        def __init__(self, ch, cw, extrapolation_value=0.0):
            self.size = (ch, cw)

        def __call__(self, image, boxes, box_ind):
            img = image.detach().numpy().transpose(0, 2, 3, 1)
            out = crop_and_resize(
                jnp.asarray(img), jnp.asarray(boxes.detach().numpy()),
                jnp.asarray(box_ind.detach().numpy().astype(np.int32)),
                self.size)
            return torch.from_numpy(
                np.asarray(out, np.float32).transpose(0, 3, 1, 2))

    cfg = _ns(
        ROIS=_ns(TRAIN_ROIS_PER_IMAGE=r, ROI_POSITIVE_RATIO=0.33),
        MRCNN=_ns(USE_MINI_MASK=True, MASK_SHAPE=[14, 14]),
        DATA=_ns(BBOX_STD_DEV=std),
        MISC=_ns(GPU_COUNT=0),
    )
    monkeypatch.setattr(ref.layers, "Variable", _novar)
    monkeypatch.setattr(ref.layers, "CropAndResizeFunction", _CRShim)
    with _old_torch():
        torch.manual_seed(0)
        rois_t, cls_t, del_t, mask_t = ref.layers.prepare_det_target(
            _t(props[None]), _t(gt_cls[None]), _t(gt_boxes[None]),
            _t(gt_masks[None]), cfg)
        ref_rois = rois_t.numpy()[0]
        ref_cls = cls_t.numpy()[0]
        ref_del = del_t.numpy()[0]
        ref_mask = mask_t.numpy()[0]

    out = detection_targets(
        jax.random.PRNGKey(1), props[None], gt_cls[None].astype(np.int32),
        gt_boxes[None], gt_masks[None], std, rois_per_image=r,
        positive_ratio=0.33, mask_shape=(14, 14), use_mini_mask=True)
    our_rois = np.asarray(out.rois)[0]
    our_cls = np.asarray(out.class_ids)[0]
    our_del = np.asarray(out.deltas)[0]
    our_mask = np.asarray(out.masks)[0]
    pos_mask = np.asarray(out.pos_mask)[0]
    valid = np.asarray(out.valid_mask)[0]

    ref_posi = [i for i in range(r) if ref_cls[i] > 0]
    our_posi = [i for i in range(r) if pos_mask[i]]
    assert 2 <= len(ref_posi) <= int(r * 0.33), \
        "test data must avoid the positive subsample"
    ref_by_box = {tuple(ref_rois[i]): i for i in ref_posi}
    our_by_box = {tuple(our_rois[i]): i for i in our_posi}
    assert set(ref_by_box) == set(our_by_box)
    for key, i in ref_by_box.items():
        j = our_by_box[key]
        assert our_cls[j] == ref_cls[i]
        np.testing.assert_allclose(our_del[j], ref_del[i],
                                   rtol=1e-4, atol=1e-4)
        agree = (our_mask[j] == ref_mask[i]).mean()
        assert agree >= 0.99, f"mask agreement {agree} at roi {key}"

    # negative budget: int(pos/ratio - pos) on both sides
    ref_negs = sum(1 for i in range(r)
                   if ref_cls[i] == 0 and np.any(ref_rois[i] != 0.0))
    our_negs = int((valid & ~pos_mask).sum())
    assert ref_negs == our_negs == int(len(ref_posi) / 0.33 - len(ref_posi))
