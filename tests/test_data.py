"""Data pipeline tests on a generated synthetic COCO dataset."""

import numpy as np
import pytest

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.data import (
    CocoDetectionDataset, Dataset, PrefetchLoader, get_data)
from feature_intertwiner_tpu.data import synthetic, transforms as T


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    synthetic.generate(str(root), num_images=6, seed=1)
    return str(root)


def _small_cfg():
    cfg = build_config(debug=True)  # 512 max dim
    cfg.DATA.MAX_GT_INSTANCES = 10
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.CTRL.QUICK_VERIFY = True
    return cfg


def test_resize_image_aspect_and_window():
    img = np.zeros((100, 200, 3), np.uint8)
    out, window, scale, pad = T.resize_image(img, min_dim=128, max_dim=256,
                                             padding=True)
    assert out.shape == (256, 256, 3)
    # scale limited by max_dim: 256/200 = 1.28
    np.testing.assert_allclose(scale, 1.28)
    top, left, y2, x2 = window
    assert x2 - left == 256 and y2 - top == 128
    assert top == (256 - 128) // 2


def test_resize_image_no_upscale_beyond_max():
    img = np.zeros((500, 1000, 3), np.uint8)
    out, window, scale, _ = T.resize_image(img, min_dim=800, max_dim=1024,
                                           padding=True)
    assert out.shape == (1024, 1024, 3)
    np.testing.assert_allclose(scale, 1.024)


def test_minimize_and_expand_mask():
    mask = np.zeros((64, 64, 1), bool)
    mask[10:30, 20:50, 0] = True
    bbox = T.extract_bboxes(mask)
    np.testing.assert_array_equal(bbox[0], [10, 20, 30, 50])
    mini = T.minimize_mask(bbox, mask, (14, 14))
    assert mini.shape == (14, 14, 1)
    assert mini.sum() > 0.8 * 14 * 14  # a filled box stays mostly filled
    back = T.expand_mask(bbox, mini, (64, 64))
    iou = (back[..., 0] & mask[..., 0]).sum() / (
        (back[..., 0] | mask[..., 0]).sum())
    assert iou > 0.9


def test_unmold_mask():
    m = np.ones((28, 28), np.float32) * 0.9
    full = T.unmold_mask(m, (5, 10, 25, 40), (64, 64))
    assert full.shape == (64, 64)
    assert full[6:24, 11:39].all()
    assert full[:5].sum() == 0


def test_image_meta_roundtrip():
    meta = T.compose_image_meta(3, (512, 512, 3), (10, 20, 500, 480),
                                np.ones(4), 77)
    ids, shape, window, active, coco_id = T.parse_image_meta(meta[None])
    assert ids[0] == 3 and coco_id[0] == 77
    np.testing.assert_array_equal(window[0], [10, 20, 500, 480])


def test_dataset_load_coco_and_masks(coco_root):
    import os
    ds = Dataset()
    coco = ds.load_coco(
        os.path.join(coco_root, "annotations", "instances_minival2014.json"),
        os.path.join(coco_root, "val2014"), return_coco=True)
    ds.prepare()
    assert ds.num_classes == 4  # BG + 3 shapes
    assert ds.num_images == 6
    img = ds.load_image(0)
    assert img.ndim == 3 and img.shape[2] == 3
    mask, cls = ds.load_mask(0)
    assert mask.shape[:2] == img.shape[:2]
    assert len(cls) == mask.shape[-1] > 0
    assert (cls > 0).all()


def test_fixed_shape_samples_and_loader(coco_root):
    cfg = _small_cfg()
    loader, val, val_api = get_data(cfg, data_root=coco_root)
    batch = next(iter(loader))
    b = cfg.TRAIN.BATCH_SIZE
    assert batch["images"].shape == (b, 512, 512, 3)
    assert batch["gt_class_ids"].shape == (b, 10)
    assert batch["gt_boxes"].shape == (b, 10, 4)
    assert batch["gt_masks"].shape == (b, 10, 56, 56)
    assert batch["image_meta"].shape[0] == b
    # boxes are pixel coords within the padded canvas
    valid = batch["gt_class_ids"] > 0
    assert valid.any()
    assert batch["gt_boxes"][valid].max() <= 512
    # all batches in an epoch
    n = sum(1 for _ in loader)
    assert n == len(loader) == 3


def test_multiscale_training_min_dims(coco_root):
    cfg = _small_cfg()
    cfg.DATA.MULTISCALE_MIN_DIMS = [256, 320, 384]
    loader, _, _ = get_data(cfg, data_root=coco_root)
    ds = loader.dataset
    # samples still land on the fixed padded canvas
    seen_windows = set()
    for i in range(4):
        s = ds[i % len(ds)]
        assert s["images"].shape == (512, 512, 3)
        w = tuple(np.asarray(s["image_meta"][4:8], np.int32).tolist())
        seen_windows.add(w)
    # with several scales the (resized) content windows should vary
    assert len(seen_windows) >= 2


def test_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("corrupt sample")
            return {"x": np.zeros(3)}

    loader = PrefetchLoader(Bad(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass


def test_loader_backpressure_bound():
    """A slow consumer must not cause the whole epoch to materialize
    (prefetch bound on undelivered batches)."""
    import time

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full(4, i, np.float32)}

    loader = PrefetchLoader(Slow(), batch_size=2, shuffle=False,
                            num_workers=4, prefetch=4)
    seen = []
    for batch in loader:
        seen.append(batch["x"][0, 0])
        time.sleep(0.01)  # slow consumer: workers would race far ahead
    assert len(seen) == 32
    assert seen == sorted(seen)  # in-order delivery
    # bound = max(prefetch, num_workers); allow one in-flight slack
    assert loader._peak_outstanding <= 5


class _SpawnDs:
    # module-level: spawn workers receive the dataset by pickle
    def __len__(self):
        return 24

    def __getitem__(self, i):
        return {"x": np.full((3, 2), i, np.float32),
                "y": np.int32(i * 7)}


class _SpawnBadDs(_SpawnDs):
    def __getitem__(self, i):
        if i == 5:
            raise ValueError("corrupt sample")
        return super().__getitem__(i)


def test_process_loader_matches_thread_loader():
    """worker_mode='process' (spawned workers, torch-DataLoader equivalent)
    must deliver bit-identical batches in the same order as the thread
    path, propagate worker exceptions, and honor the prefetch bound."""
    kw = dict(batch_size=4, shuffle=True, seed=3, num_workers=2, prefetch=2)
    thread = list(PrefetchLoader(_SpawnDs(), worker_mode="thread", **kw))
    proc_loader = PrefetchLoader(_SpawnDs(), worker_mode="process", **kw)
    proc = list(proc_loader)
    assert len(proc) == len(thread) == 6
    for bt, bp in zip(thread, proc):
        np.testing.assert_array_equal(bt["x"], bp["x"])
        np.testing.assert_array_equal(bt["y"], bp["y"])
    assert proc_loader._peak_outstanding <= 3

    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in PrefetchLoader(_SpawnBadDs(), worker_mode="process", **kw):
            pass


def test_real_dataset_loads_under_process_workers(coco_root):
    """CocoDetectionDataset must survive the spawn pickle round-trip (the
    real train path with DATA.LOADER_WORKER_MODE='process')."""
    cfg = _small_cfg()
    loader, _, _ = get_data(cfg, data_root=coco_root)
    ds = loader.dataset
    proc = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                          prefetch=2, worker_mode="process")
    ref = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                         prefetch=2, worker_mode="thread")
    for bp, bt in zip(proc, ref):
        assert set(bp) == set(bt)
        np.testing.assert_array_equal(bp["images"], bt["images"])
        break  # one batch proves the pickle/spawn path


def test_augmentation_varies_across_epochs(coco_root):
    cfg = _small_cfg()
    loader, _, _ = get_data(cfg, data_root=coco_root)
    ds = loader.dataset
    imgs = {}
    for epoch in (1, 2, 3, 4):
        loader.set_epoch(epoch)
        imgs[epoch] = np.stack([ds[i]["images"] for i in range(4)])
    # same epoch is deterministic
    loader.set_epoch(1)
    np.testing.assert_array_equal(
        imgs[1], np.stack([ds[i]["images"] for i in range(4)]))
    # across epochs the flip augmentation must differ for at least one image
    diffs = [not np.array_equal(imgs[1], imgs[e]) for e in (2, 3, 4)]
    assert any(diffs), "augmentation is frozen across epochs"


def test_load_mask_crowd_size_mismatch(coco_root):
    """Crowd RLEs with an embedded size smaller than the image must not
    crash load_mask — the reference substitutes a full-image mask
    (dataset_coco.py:301-304)."""
    import os
    from feature_intertwiner_tpu.evaluation.rle import RLE

    ds = Dataset()
    ds.load_coco(
        os.path.join(coco_root, "annotations", "instances_minival2014.json"),
        os.path.join(coco_root, "val2014"))
    ds.prepare()
    info = ds.image_info[0]
    h, w = info["height"], info["width"]
    small = RLE.encode(np.ones((h // 2, w // 2), bool))
    info["annotations"] = list(info["annotations"]) + [{
        "category_id": info["annotations"][0]["category_id"],
        "iscrowd": 1,
        "segmentation": {"size": [h // 2, w // 2],
                         "counts": small.counts.tolist()},
    }]
    mask, cls = ds.load_mask(0)
    assert mask.shape[:2] == (h, w)
    assert (cls < 0).sum() == 1  # the crowd is present, negative id


def test_resize_mask_empty_keeps_canvas_shape():
    mask = np.zeros((100, 140, 0), bool)
    img = np.zeros((100, 140, 3), np.uint8)
    out_img, window, scale, pad = T.resize_image(img, min_dim=96, max_dim=128,
                                                 padding=True)
    out = T.resize_mask(mask, scale, pad)
    assert out.shape[:2] == out_img.shape[:2]
    assert out.shape[2] == 0


def test_generate_rich_benchmark_split(tmp_path):
    """The held-out ablation benchmark generator: 8 shape classes, a
    small/large instance mix spanning the COCO area bands, exact RLE
    segmentations, and the train/ vs val/ directory convention."""
    import json
    import os

    root = str(tmp_path / "rich")
    synthetic.generate_rich(root, num_images=6, split="train", seed=0)
    synthetic.generate_rich(root, num_images=3, split="minival", seed=1)
    assert os.path.isdir(os.path.join(root, "train2014"))
    assert os.path.isdir(os.path.join(root, "val2014"))
    ann = json.load(open(os.path.join(
        root, "annotations", "instances_train2014.json")))
    assert len(ann["categories"]) == 8
    assert len(ann["images"]) == 6
    areas = [a["area"] for a in ann["annotations"]]
    assert any(a < 32 ** 2 for a in areas), "needs COCO-small instances"
    assert any(a > 2 * 32 ** 2 for a in areas), "needs large instances"
    cats = {a["category_id"] for a in ann["annotations"]}
    assert len(cats) >= 5
    # loads through the full Dataset/RLE stack with consistent shapes
    ds = Dataset()
    ds.load_coco(os.path.join(root, "annotations",
                              "instances_train2014.json"),
                 os.path.join(root, "train2014"))
    ds.prepare()
    img = ds.load_image(0)
    mask, cls = ds.load_mask(0)
    assert mask.shape[:2] == img.shape[:2]
    assert len(cls) == mask.shape[-1] > 0
    # RLE areas round-trip: decoded mask area equals the annotation area
    a0 = ann["annotations"][0]
    from feature_intertwiner_tpu.evaluation.rle import RLE
    dec = RLE.from_coco(a0["segmentation"], 320, 320).decode()
    assert abs(float(dec.sum()) - a0["area"]) < 1e-6


def test_synthetic_small_canvas(tmp_path):
    """generate() must work for small smoke-test canvases (objects scale)."""
    root = str(tmp_path / "small")
    synthetic.generate(root, num_images=2, size=(48, 56), seed=0)
    import os, json
    ann = json.load(open(os.path.join(
        root, "annotations", "instances_minival2014.json")))
    assert len(ann["images"]) == 2 and len(ann["annotations"]) > 0
