"""COCO dataset registry + fixed-shape training batches.

Capability parity with ``/root/reference/datasets/dataset_coco.py``:

- :class:`Dataset` — the class/image registry (add_class/add_image/prepare,
  source↔internal id maps, :15-137);
- :meth:`Dataset.load_coco` — populate from COCO annotations with optional
  class filtering; minival / valminusvalminusminival split selection happens
  through the annotation file path (:139-188);
- :meth:`Dataset.load_mask` — per-instance binary masks via the native RLE
  stack, skipping degenerate objects, crowds as negative class ids (:262-356);
- :class:`CocoDetectionDataset` — per-index full preprocessing
  (load_image_and_gt) producing **fixed-shape** samples: GTs padded to
  ``DATA.MAX_GT_INSTANCES`` (the reference pads dynamically per batch in
  ``adjust_input_gt``, lib/model.py:226-249; static padding is the TPU
  equivalent — zero class-id rows are ignored by target assignment);
- :func:`get_data` — (train loader, val dataset, val COCO api) with the
  QUICK_VERIFY fallback of training on minival (:449-477).

Auto-download is stubbed out: this environment has no egress; point
``DATASET.PATH`` at an existing COCO layout (or use data/synthetic.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from ..evaluation.coco import COCO
from ..evaluation.rle import RLE
from . import transforms as T
from .loader import PrefetchLoader


class Dataset:
    """Generic detection-dataset registry (source-namespaced class ids)."""

    def __init__(self):
        self._image_ids: List[int] = []
        self.image_info: List[dict] = []
        self.class_info: List[dict] = [
            {"source": "", "id": 0, "name": "BG"}]
        self.source_class_ids: Dict[str, List[int]] = {}

    def add_class(self, source: str, class_id: int, class_name: str):
        for info in self.class_info:
            if info["source"] == source and info["id"] == class_id:
                return
        self.class_info.append(
            {"source": source, "id": class_id, "name": class_name})

    def add_image(self, source: str, image_id, path: Optional[str], **kwargs):
        info = {"id": image_id, "source": source, "path": path}
        info.update(kwargs)
        self.image_info.append(info)

    def prepare(self):
        self.num_classes = len(self.class_info)
        self.class_ids = np.arange(self.num_classes)
        self.class_names = [c["name"] for c in self.class_info]
        self.num_images = len(self.image_info)
        self._image_ids = np.arange(self.num_images)
        self.class_from_source_map = {
            f"{c['source']}.{c['id']}": i
            for i, c in enumerate(self.class_info)}
        self.sources = list({c["source"] for c in self.class_info if c["source"]})
        self.source_class_ids = {}
        for source in self.sources + [""]:
            self.source_class_ids[source] = [
                i for i, c in enumerate(self.class_info)
                if c["source"] == source or i == 0]

    @property
    def image_ids(self):
        return self._image_ids

    def map_source_class_id(self, source_class_id: str) -> int:
        return self.class_from_source_map[source_class_id]

    def get_source_class_id(self, class_id: int, source: str) -> int:
        info = self.class_info[class_id]
        assert info["source"] == source
        return info["id"]

    # -- COCO ------------------------------------------------------------
    @staticmethod
    def auto_download(data_dir: str, split: str, year: str = "2014"):
        """Download+unzip COCO images/annotations if missing (parity:
        dataset_coco.py:190-259). Gated: zero-egress environments raise with
        instructions instead of hanging."""
        import urllib.request
        import zipfile

        urls = {
            "images": f"http://images.cocodataset.org/zips/{split}{year}.zip",
            "annotations": ("http://images.cocodataset.org/annotations/"
                            f"annotations_trainval{year}.zip"),
        }
        img_dir = os.path.join(data_dir, f"{split}{year}")
        ann_dir = os.path.join(data_dir, "annotations")
        for name, url in urls.items():
            target = img_dir if name == "images" else ann_dir
            if os.path.exists(target):
                continue
            os.makedirs(data_dir, exist_ok=True)
            zip_path = os.path.join(data_dir, os.path.basename(url))
            try:
                print(f"downloading {url} ...")
                urllib.request.urlretrieve(url, zip_path)
            except OSError as exc:
                raise RuntimeError(
                    f"auto_download failed ({exc}); this environment may "
                    f"have no egress — place COCO manually under {data_dir} "
                    f"or use data/synthetic.py") from exc
            with zipfile.ZipFile(zip_path) as zf:
                zf.extractall(data_dir)
            os.remove(zip_path)

    def load_coco(self, annotation_file: str, image_dir: str,
                  class_ids: Optional[List[int]] = None,
                  return_coco: bool = False,
                  auto_download: bool = False):
        if auto_download:
            split = os.path.basename(image_dir).rstrip("0123456789")
            year = os.path.basename(image_dir)[len(split):]
            self.auto_download(os.path.dirname(image_dir), split, year)
        coco = COCO(annotation_file)
        if class_ids:
            image_ids = []
            for cid in class_ids:
                image_ids.extend(coco.getImgIds(catIds=[cid]))
            image_ids = list(set(image_ids))
        else:
            class_ids = sorted(coco.getCatIds())
            image_ids = list(coco.imgs.keys())

        for cid in class_ids:
            self.add_class("coco", cid, coco.loadCats(cid)[0]["name"])
        for iid in image_ids:
            self.add_image(
                "coco", image_id=iid,
                path=os.path.join(image_dir, coco.imgs[iid]["file_name"]),
                width=coco.imgs[iid]["width"],
                height=coco.imgs[iid]["height"],
                annotations=coco.loadAnns(coco.getAnnIds(
                    imgIds=[iid], iscrowd=None)))
        if return_coco:
            return coco

    # -- per-image loading ----------------------------------------------
    def load_image(self, image_id: int) -> np.ndarray:
        path = self.image_info[image_id]["path"]
        img = np.asarray(Image.open(path).convert("RGB"))
        return img

    def load_mask(self, image_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (mask [H, W, N] bool, class_ids [N] int32; crowds negative)."""
        info = self.image_info[image_id]
        if info["source"] != "coco":
            return (np.zeros((info.get("height", 1), info.get("width", 1), 0),
                             bool), np.zeros((0,), np.int32))
        masks, class_ids = [], []
        h, w = info["height"], info["width"]
        for ann in info["annotations"]:
            cid = self.class_from_source_map.get(
                f"coco.{ann['category_id']}")
            if cid is None:
                continue
            m = RLE.from_coco(ann["segmentation"], h, w).decode().astype(bool)
            if m.sum() < 1:
                continue
            if ann.get("iscrowd", 0):
                cid = -cid
                # crowd RLEs sometimes embed a size smaller than the image
                # (real COCO-2014 data); the reference replaces such masks
                # with a full-image mask (dataset_coco.py:301-304) — without
                # this, np.stack below crashes on the shape mismatch
                if m.shape != (h, w):
                    m = np.ones((h, w), bool)
            masks.append(m)
            class_ids.append(cid)
        if not masks:
            return np.zeros((h, w, 0), bool), np.zeros((0,), np.int32)
        return np.stack(masks, -1), np.asarray(class_ids, np.int32)


class CocoDetectionDataset:
    """Indexable dataset producing fixed-shape training samples."""

    def __init__(self, dataset: Dataset, config, augment: bool = True,
                 seed: int = 0):
        self.dataset = dataset
        self.config = config
        self.augment = augment
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Vary the per-sample augmentation stream across epochs (the
        reference's global-RNG augmentation differs per visit; a seed from
        (seed, idx) alone would freeze each image's flip/scale forever)."""
        self._epoch = epoch

    def __len__(self):
        return self.dataset.num_images

    def __getitem__(self, idx: int) -> dict:
        cfg = self.config
        rng = np.random.RandomState(
            (self.seed * 100003 + self._epoch * 7919 + idx) % (2 ** 31))
        image, meta, class_ids, bbox, mask = T.load_image_and_gt(
            self.dataset, cfg, int(idx), augment=self.augment,
            use_mini_mask=cfg.MRCNN.USE_MINI_MASK, rng=rng)
        image = image.astype(np.float32) - np.asarray(
            cfg.DATA.MEAN_PIXEL, np.float32)

        g = int(cfg.DATA.MAX_GT_INSTANCES)
        n = min(len(class_ids), g)
        mh, mw = (cfg.MRCNN.MINI_MASK_SHAPE if cfg.MRCNN.USE_MINI_MASK
                  else image.shape[:2])
        gt_cls = np.zeros((g,), np.int32)
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_masks = np.zeros((g, mh, mw), np.float32)
        gt_cls[:n] = class_ids[:n]
        gt_boxes[:n] = bbox[:n].astype(np.float32)
        if mask.size:
            gt_masks[:n] = np.transpose(mask[:, :, :n], (2, 0, 1))
        return {
            "images": image,
            "gt_class_ids": gt_cls,
            "gt_boxes": gt_boxes,
            "gt_masks": gt_masks,
            "image_meta": meta,
        }


def get_data(config, data_root: Optional[str] = None):
    """(train loader, val Dataset, val COCO api) — parity with
    dataset_coco.py:449-477 (minival for val; train+valminusminival for
    train; QUICK_VERIFY trains on minival)."""
    root = data_root or config.DATASET.PATH
    year = config.DATASET.YEAR

    def ann_path(split):
        return os.path.join(root, "annotations",
                            f"instances_{split}{year}.json")

    val = Dataset()
    val_api = val.load_coco(ann_path("minival"),
                            os.path.join(root, f"val{year}"),
                            return_coco=True)
    val.prepare()

    train = Dataset()
    if config.CTRL.QUICK_VERIFY:
        train.load_coco(ann_path("minival"), os.path.join(root, f"val{year}"))
    else:
        train.load_coco(ann_path("train"), os.path.join(root, f"train{year}"))
        vmm = ann_path("valminusminival")
        if os.path.exists(vmm):
            train.load_coco(vmm, os.path.join(root, f"val{year}"))
    train.prepare()

    ds = CocoDetectionDataset(train, config, augment=True,
                              seed=config.MISC.SEED)
    loader = PrefetchLoader(
        ds, batch_size=config.TRAIN.BATCH_SIZE, shuffle=True,
        num_workers=config.DATA.LOADER_WORKER_NUM, seed=config.MISC.SEED,
        worker_mode=config.DATA.get("LOADER_WORKER_MODE", "thread"))
    return loader, val, val_api
