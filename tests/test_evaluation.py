"""Evaluation stack tests: native RLE ops, COCO index, mAP protocol."""

import json

import numpy as np
import pytest

from feature_intertwiner_tpu.evaluation.rle import (
    RLE, _counts_to_string, _string_to_counts, bbox_iou_matrix)
from feature_intertwiner_tpu.evaluation import COCO, COCOeval


def test_native_library_built():
    from feature_intertwiner_tpu.evaluation import rle
    assert rle._LIB is not None, "native maskrle.so should build with g++"


def test_rle_roundtrip(rng):
    m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
    r = RLE.encode(m)
    np.testing.assert_array_equal(r.decode(), m)
    assert r.area() == m.sum()


def test_rle_string_codec(rng):
    m = (rng.rand(64, 48) > 0.5).astype(np.uint8)
    r = RLE.encode(m)
    s = _counts_to_string(r.counts)
    back = _string_to_counts(s)
    np.testing.assert_array_equal(back, r.counts)


def test_rle_iou_matches_dense(rng):
    a = (rng.rand(40, 40) > 0.5).astype(np.uint8)
    b = (rng.rand(40, 40) > 0.5).astype(np.uint8)
    ra, rb = RLE.encode(a), RLE.encode(b)
    inter = float((a & b).sum())
    union = float((a | b).sum())
    np.testing.assert_allclose(ra.iou(rb), inter / union, rtol=1e-9)
    np.testing.assert_allclose(ra.iou(rb, iscrowd=True), inter / a.sum(),
                               rtol=1e-9)


def test_rle_merge_union(rng):
    a = (rng.rand(30, 30) > 0.7).astype(np.uint8)
    b = (rng.rand(30, 30) > 0.7).astype(np.uint8)
    merged = RLE.merge([RLE.encode(a), RLE.encode(b)])
    np.testing.assert_array_equal(merged.decode(), (a | b).astype(np.uint8))


def test_rle_bbox(rng):
    m = np.zeros((50, 60), np.uint8)
    m[10:20, 15:40] = 1
    bb = RLE.encode(m).bbox()
    np.testing.assert_array_equal(bb, [15, 10, 25, 10])


def test_polygon_rasterization_rectangle():
    # axis-aligned rectangle: area must be near-exact
    poly = [10, 10, 30, 10, 30, 25, 10, 25]
    r = RLE.from_poly(poly, 40, 40)
    m = r.decode()
    assert abs(m.sum() - 21 * 16) < 60  # 21x16 incl. boundary, small tolerance
    assert m[17, 20] == 1 and m[5, 5] == 0


def test_bbox_iou_matrix_crowd():
    dt = np.array([[0, 0, 10, 10]])
    gt = np.array([[5, 5, 10, 10], [0, 0, 20, 20]])
    out = bbox_iou_matrix(dt, gt, np.array([0, 1], np.uint8))
    np.testing.assert_allclose(out[0, 0], 25 / 175, rtol=1e-9)
    np.testing.assert_allclose(out[0, 1], 100 / 100, rtol=1e-9)  # crowd: /dt area


def _toy_dataset(tmp_path):
    images = [{"id": i, "height": 100, "width": 100,
               "file_name": f"im{i}.jpg"} for i in range(3)]
    cats = [{"id": 1, "name": "cat", "supercategory": "animal"},
            {"id": 2, "name": "dog", "supercategory": "animal"}]
    anns = []
    aid = 1
    gt_boxes = {
        0: [(1, [10, 10, 20, 20]), (2, [50, 50, 30, 20])],
        1: [(1, [0, 0, 40, 40])],
        2: [(2, [20, 20, 25, 25]), (2, [60, 60, 10, 10])],
    }
    for img_id, items in gt_boxes.items():
        for cat, bb in items:
            anns.append({"id": aid, "image_id": img_id, "category_id": cat,
                         "bbox": bb, "area": bb[2] * bb[3], "iscrowd": 0,
                         "segmentation": [[bb[0], bb[1], bb[0] + bb[2], bb[1],
                                           bb[0] + bb[2], bb[1] + bb[3],
                                           bb[0], bb[1] + bb[3]]]})
            aid += 1
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(
        {"images": images, "categories": cats, "annotations": anns}))
    return str(path), gt_boxes


def test_coco_index_and_queries(tmp_path):
    path, gt = _toy_dataset(tmp_path)
    coco = COCO(path)
    assert sorted(coco.imgs.keys()) == [0, 1, 2]
    assert coco.getCatIds(catNms=["cat"]) == [1]
    assert set(coco.getImgIds(catIds=[2])) == {0, 2}
    anns = coco.loadAnns(coco.getAnnIds(imgIds=0))
    assert len(anns) == 2
    m = coco.annToMask(anns[0])
    assert m.shape == (100, 100) and m.sum() > 0


def test_cocoeval_perfect_predictions(tmp_path):
    path, gt = _toy_dataset(tmp_path)
    coco = COCO(path)
    results = []
    for img_id, items in gt.items():
        for cat, bb in items:
            results.append({"image_id": img_id, "category_id": cat,
                            "bbox": list(bb), "score": 0.9})
    dt = coco.loadRes(results)
    ev = COCOeval(coco, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)  # perfect AP
    np.testing.assert_allclose(stats[8], 1.0, atol=1e-6)  # AR@100


def test_cocoeval_half_wrong(tmp_path):
    path, gt = _toy_dataset(tmp_path)
    coco = COCO(path)
    results = []
    for img_id, items in gt.items():
        for k, (cat, bb) in enumerate(items):
            if (img_id + k) % 2 == 0:
                results.append({"image_id": img_id, "category_id": cat,
                                "bbox": list(bb), "score": 0.9})
            else:  # badly offset box
                results.append({"image_id": img_id, "category_id": cat,
                                "bbox": [bb[0] + 50, bb[1] + 50, bb[2], bb[3]],
                                "score": 0.8})
    dt = coco.loadRes(results)
    ev = COCOeval(coco, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert 0.1 < stats[0] < 0.9


def test_cocoeval_segm(tmp_path):
    path, gt = _toy_dataset(tmp_path)
    coco = COCO(path)
    results = []
    for img_id, items in gt.items():
        for cat, bb in items:
            m = np.zeros((100, 100), np.uint8)
            m[bb[1]:bb[1] + bb[3], bb[0]:bb[0] + bb[2]] = 1
            results.append({"image_id": img_id, "category_id": cat,
                            "segmentation": RLE.encode(m).to_coco(),
                            "score": 0.9})
    dt = coco.loadRes(results)
    ev = COCOeval(coco, dt, "segm")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] > 0.5  # near-perfect modulo polygon-vs-box rasterization


def test_matching_vectorized_vs_loop_oracle():
    """Randomized differential test of COCOeval's greedy matcher against a
    direct transcription of the sequential rules (crowds reusable, unignored
    preferred, max IoU, ties to the later gt)."""
    from feature_intertwiner_tpu.evaluation.cocoeval import COCOeval, Params

    rng = np.random.RandomState(0)
    for trial in range(30):
        d, g = rng.randint(1, 12), rng.randint(0, 9)
        ious = np.round(rng.rand(d, g) * rng.choice([1, 1, 0.8]), 2)
        g_ignore = rng.rand(g) < 0.3
        crowd = (rng.rand(g) < 0.25) & g_ignore
        thrs = np.linspace(0.5, 0.95, 10)
        t = len(thrs)

        # oracle: sequential triple loop
        gm_o = -np.ones((t, g), np.int64)
        dm_o = -np.ones((t, d), np.int64)
        dig_o = np.zeros((t, d), bool)
        for ti, thr in enumerate(np.minimum(thrs, 1 - 1e-10)):
            for di in range(d):
                best, match = thr, -1
                for gi in range(g):
                    if gm_o[ti, gi] >= 0 and not crowd[gi]:
                        continue
                    if match > -1 and not g_ignore[match] and g_ignore[gi]:
                        break
                    if ious[di, gi] < best:
                        continue
                    best, match = ious[di, gi], gi
                if match >= 0:
                    dm_o[ti, di] = match
                    gm_o[ti, match] = di
                    dig_o[ti, di] = g_ignore[match]

        # vectorized path via a minimal COCOeval instance
        ev = COCOeval.__new__(COCOeval)
        ev.params = Params("bbox")
        gts = [{"iscrowd": int(crowd[i]), "ignore": int(g_ignore[i] and not crowd[i]),
                "area": 50.0, "bbox": [0, 0, 5, 10]} for i in range(g)]
        dts = [{"score": 1.0 - 0.01 * i, "bbox": [0, 0, 5, 10]}
               for i in range(d)]
        ev._gts = {(0, 1): gts}
        ev._dts = {(0, 1): dts}
        ev._ious = {(0, 1): ious}
        out = ev._evaluate_img(0, 1, [0, 1e10], 100)
        # gts are pre-sorted unignored-first inside _evaluate_img; build the
        # same permutation to compare
        order = np.argsort(g_ignore, kind="stable")
        iou_perm = ious[:, order]
        gi_perm = g_ignore[order]
        # recompute oracle on the permuted layout (what _evaluate_img sees)
        gm_p = -np.ones((t, g), np.int64)
        dm_p = -np.ones((t, d), np.int64)
        dig_p = np.zeros((t, d), bool)
        crowd_p = crowd[order]
        for ti, thr in enumerate(np.minimum(thrs, 1 - 1e-10)):
            for di in range(d):
                best, match = thr, -1
                for gi in range(g):
                    if gm_p[ti, gi] >= 0 and not crowd_p[gi]:
                        continue
                    if match > -1 and not gi_perm[match] and gi_perm[gi]:
                        break
                    if iou_perm[di, gi] < best:
                        continue
                    best, match = iou_perm[di, gi], gi
                if match >= 0:
                    dm_p[ti, di] = match
                    gm_p[ti, match] = di
                    dig_p[ti, di] = gi_perm[match]
        np.testing.assert_array_equal(out["dt_matches"], dm_p,
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(
            out["dt_ignore"],
            dig_p | ((dm_p == -1) & np.zeros((1, d), bool)),
            err_msg=f"trial {trial}")


def test_cocoeval_use_cats_false(tmp_path):
    """Category-agnostic evaluation (pycocotools useCats=0): perfect boxes
    under the WRONG category still score AP 1.0."""
    path, gt = _toy_dataset(tmp_path)
    coco = COCO(path)
    results = []
    for img_id, items in gt.items():
        for cat, bb in items:
            wrong_cat = 1 if cat != 1 else 2
            results.append({"image_id": img_id, "category_id": wrong_cat,
                            "bbox": list(bb), "score": 0.9})
    dt = coco.loadRes(results)
    ev = COCOeval(coco, dt, "bbox")
    ev.params.use_cats = False
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)
    # sanity: with categories ON the same detections score 0
    ev2 = COCOeval(coco, dt, "bbox")
    ev2.evaluate()
    ev2.accumulate()
    stats2 = ev2.summarize()
    assert stats2[0] < 0.2


def test_polygon_fallback_matches_native(rng, monkeypatch):
    """The pure-numpy even-odd rasterizer approximates the native one: IoU
    against it must be high for generic convex polygons."""
    import feature_intertwiner_tpu.evaluation.rle as rle_mod
    if rle_mod._LIB is None:
        pytest.skip("native maskrle not built; nothing to compare against")
    # a few random convex polygons (triangle fans around a center)
    for t in range(3):
        c = rng.uniform(15, 25, 2)
        angles = np.sort(rng.uniform(0, 2 * np.pi, 6))
        radii = rng.uniform(5, 12, 6)
        pts = np.stack([c[0] + radii * np.cos(angles),
                        c[1] + radii * np.sin(angles)], 1)  # (x, y)
        poly = pts.reshape(-1).tolist()
        native = RLE.from_poly(poly, 40, 40).decode()
        monkeypatch.setattr(rle_mod, "_LIB", None)
        fallback = RLE.from_poly(poly, 40, 40).decode()
        monkeypatch.undo()
        inter = np.logical_and(native, fallback).sum()
        union = np.logical_or(native, fallback).sum()
        assert union > 0 and inter / union > 0.85, (t, inter, union)
