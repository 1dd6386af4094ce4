"""Exactness tests: block-fixpoint NMS vs. a straightforward numpy oracle
implementing the reference's greedy sweep (nms.c:35-64 / nms_kernel.cu)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.nms import batched_nms, class_aware_nms, nms


def np_greedy_nms(boxes, scores, thresh, plus_one=True, strict=True):
    """Oracle: sequential greedy NMS. Returns kept indices in score order."""
    off = 1.0 if plus_one else 0.0
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        yi1, xi1, yi2, xi2 = boxes[i]
        ai = (yi2 - yi1 + off) * (xi2 - xi1 + off)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            y1 = max(yi1, boxes[j][0]); x1 = max(xi1, boxes[j][1])
            y2 = min(yi2, boxes[j][2]); x2 = min(xi2, boxes[j][3])
            inter = max(y2 - y1 + off, 0) * max(x2 - x1 + off, 0)
            aj = (boxes[j][2] - boxes[j][0] + off) * (boxes[j][3] - boxes[j][1] + off)
            iou = inter / (ai + aj - inter)
            if (iou > thresh) if strict else (iou >= thresh):
                suppressed[j] = True
    return np.array(keep, np.int32)


def _random_boxes(rng, n, extent=200.0, size=60.0):
    y1x1 = rng.rand(n, 2) * extent
    hw = rng.rand(n, 2) * size + 1.0
    return np.concatenate([y1x1, y1x1 + hw], 1).astype(np.float32)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n,block", [(50, 16), (300, 64), (700, 256)])
def test_nms_exact_vs_oracle(seed, n, block):
    rng = np.random.RandomState(seed)
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.5)
    idx, ok = nms(jnp.array(boxes), jnp.array(scores), 0.5, n, block=block)
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("plus_one,strict", [(True, True), (False, False), (False, True)])
def test_nms_conventions(plus_one, strict):
    rng = np.random.RandomState(7)
    boxes = _random_boxes(rng, 120, extent=50.0, size=40.0)  # heavy overlap
    scores = rng.rand(120).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.5, plus_one, strict)
    idx, ok = nms(jnp.array(boxes), jnp.array(scores), 0.5, 120,
                  plus_one=plus_one, strict=strict, block=64)
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, want)


def test_nms_max_output_truncates():
    rng = np.random.RandomState(3)
    boxes = _random_boxes(rng, 200)
    scores = rng.rand(200).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.7)[:10]
    idx, ok = nms(jnp.array(boxes), jnp.array(scores), 0.7, 10, block=64)
    assert np.asarray(ok).sum() == 10
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_nms_respects_valid_mask():
    rng = np.random.RandomState(9)
    boxes = _random_boxes(rng, 64)
    scores = rng.rand(64).astype(np.float32)
    valid = rng.rand(64) > 0.4
    # oracle with masking (subset indices must map back to original ids):
    keep = []
    order = np.argsort(-np.where(valid, scores, -1e30), kind="stable")
    suppressed = ~valid.copy()
    for _i in range(64):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, 64):
            j = order[_j]
            if suppressed[j]:
                continue
            y1 = max(boxes[i][0], boxes[j][0]); x1 = max(boxes[i][1], boxes[j][1])
            y2 = min(boxes[i][2], boxes[j][2]); x2 = min(boxes[i][3], boxes[j][3])
            inter = max(y2 - y1 + 1, 0) * max(x2 - x1 + 1, 0)
            ai = (boxes[i][2] - boxes[i][0] + 1) * (boxes[i][3] - boxes[i][1] + 1)
            aj = (boxes[j][2] - boxes[j][0] + 1) * (boxes[j][3] - boxes[j][1] + 1)
            if inter / (ai + aj - inter) > 0.5:
                suppressed[j] = True
    idx, ok = nms(jnp.array(boxes), jnp.array(scores), 0.5, 64,
                  valid=jnp.array(valid), block=16)
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, np.array(keep))


def test_batched_nms_independent_per_sample():
    rng = np.random.RandomState(1)
    boxes = np.stack([_random_boxes(rng, 100) for _ in range(3)])
    scores = rng.rand(3, 100).astype(np.float32)
    idx, ok = batched_nms(jnp.array(boxes), jnp.array(scores), 0.5, 100, block=64)
    for b in range(3):
        want = np_greedy_nms(boxes[b], scores[b], 0.5)
        got = np.asarray(idx[b])[np.asarray(ok[b])]
        np.testing.assert_array_equal(got, want)


def test_class_aware_nms_matches_per_class_loop():
    rng = np.random.RandomState(5)
    boxes = _random_boxes(rng, 150, extent=80.0, size=50.0)
    scores = rng.rand(150).astype(np.float32)
    cls = rng.randint(1, 5, 150)
    # oracle: per-class greedy, then merge and sort by score
    kept = []
    for c in np.unique(cls):
        sel = np.where(cls == c)[0]
        k = np_greedy_nms(boxes[sel], scores[sel], 0.3)
        kept.extend(sel[k].tolist())
    kept = sorted(kept, key=lambda i: -scores[i])
    idx, ok = class_aware_nms(jnp.array(boxes), jnp.array(scores),
                              jnp.array(cls), 0.3, 150, block=64)
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, np.array(kept, np.int32))


def test_nms_degenerate_all_same_box():
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (32, 1))
    scores = np.linspace(1, 0, 32).astype(np.float32)
    idx, ok = nms(jnp.array(boxes), jnp.array(scores), 0.5, 32, block=16)
    assert np.asarray(ok).sum() == 1
    assert np.asarray(idx)[0] == 0


def test_pallas_nms_matches_xla_sweep():
    """The fused single-kernel Pallas NMS (ops/nms_pallas.py) is bit-exact
    with the XLA block sweep (interpret mode on CPU; verified on TPU too)."""
    from feature_intertwiner_tpu.ops.nms import _greedy_alive_sorted
    from feature_intertwiner_tpu.ops.nms_pallas import nms_alive_pallas_batched

    rng = np.random.RandomState(11)
    b, n = 2, 192
    y1x1 = rng.rand(b, n, 2).astype(np.float32) * 120
    wh = rng.rand(b, n, 2).astype(np.float32) * 50 + 4
    boxes = np.concatenate([y1x1, y1x1 + wh], -1)
    valid = rng.rand(b, n) > 0.15
    got = np.asarray(nms_alive_pallas_batched(
        jnp.array(boxes), jnp.array(valid), 0.5, block=64, interpret=True))
    want = np.stack([
        np.asarray(_greedy_alive_sorted(
            jnp.array(boxes[i]), jnp.array(valid[i]), 0.5, True, True, 64))
        for i in range(b)])
    np.testing.assert_array_equal(got, want)
