"""InterNet: the full two-stage detector with the Feature Intertwiner.

Top-level module, capability parity with ``MaskRCNN``
(``/root/reference/lib/model.py:18-471``): ResNet-FPN backbone → RPN →
proposal layer → Dev (intertwiner RoI stage) → classifier/mask heads, with
train / inference / visualize forward modes.

Everything here is one jittable function per mode — target assignment and
NMS-based layers included (the reference runs those as per-sample Python/CUDA
host loops inside ``forward``; SURVEY.md §3 hot loops #3-#4).

Reference quirks (SURVEY.md §3.5) handled explicitly:
- #1 training ran with eval-mode BN and POST_NMS_ROIS_INFERENCE proposals
  because of a truthy mode check (model.py:265-277). ``strict_quirks=True``
  (default) reproduces that — it's the behavior the published numbers were
  trained with; set False for the "intended" 2000-proposal training.
- The class buffer is functional state threaded through the train step
  (train/step.py), not module state.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import generate_pyramid_anchors
from ..ops.detection import detection_layer
from ..ops.proposals import proposal_layer
from ..ops.targets import detection_targets, rpn_targets
from .fpn import FPN
from .heads import BoxHead, MaskHead
from .intertwiner import Dev
from .ot import OptTrans1D
from .resnet import ResNet
from .rpn import RPNHead, run_rpn_over_pyramid


class InterNet(nn.Module):
    # architecture
    backbone: str = "resnet101"
    num_classes: int = 81
    image_size: int = 1024
    fpn_channels: int = 256
    anchor_scales: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: int = 1
    strides: tuple = (4, 8, 16, 32, 64)
    # rpn / proposals
    rpn_nms_threshold: float = 0.7
    pre_nms_limit: int = 6000
    post_nms_train: int = 2000
    post_nms_inference: int = 1000
    train_anchors_per_image: int = 256
    rpn_pos_thresh: float = 0.7
    rpn_neg_thresh: float = 0.3
    # rois / heads
    pool_size: int = 7
    mask_pool_size: int = 14
    mask_shape: tuple = (28, 28)
    rois_per_image: int = 200
    positive_ratio: float = 0.33
    assign_base: float = 224.0
    roi_method: str = "roi_align"
    roi_pool_window_cap: int = 8
    use_mini_mask: bool = True
    bbox_std: tuple = (0.1, 0.1, 0.2, 0.2)
    # test
    det_max_instances: int = 100
    det_nms_threshold: float = 0.3
    det_min_confidence: float = 0.0
    # intertwiner
    dev_switch: bool = False
    dev_structure: str = "beta"
    dev_loss_choice: str = "l1"
    dev_upsample_fac: float = 2.0
    dev_upsample_init: str = "xavier"
    dev_upsample_residual: bool = False
    dev_multi_upsampler: bool = False
    dev_dis_upsampler: bool = False
    dev_baseline: bool = False
    dev_big_supervise: bool = False
    dev_big_feat_detach: bool = True
    dev_assign_all_scale: bool = False
    dev_feat_pool_size: int = 14
    dev_ot_one_dim_form: str = "conv"
    cls_merge_feat: bool = False
    cls_merge_manner: str = "simple_add"
    cls_merge_fac: float = 0.5
    # training loss options
    fpn_ot_loss: bool = False
    # quirk fidelity (SURVEY.md §3.5 #1)
    strict_quirks: bool = True
    # tpu
    remat_backbone: bool = False
    roi_window_kernel: bool = False
    roi_window: int = 32
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32) -> "InterNet":
        """Build from a finalized Config (config.py)."""
        return cls(
            backbone=cfg.MODEL.BACKBONE,
            num_classes=cfg.DATASET.NUM_CLASSES,
            image_size=int(cfg.DATA.IMAGE_MAX_DIM),
            anchor_scales=tuple(cfg.RPN.ANCHOR_SCALES),
            anchor_ratios=tuple(cfg.RPN.ANCHOR_RATIOS),
            anchor_stride=cfg.RPN.ANCHOR_STRIDE,
            strides=tuple(cfg.MODEL.BACKBONE_STRIDES),
            rpn_nms_threshold=cfg.RPN.NMS_THRESHOLD,
            pre_nms_limit=cfg.RPN.PRE_NMS_LIMIT,
            post_nms_train=cfg.RPN.POST_NMS_ROIS_TRAINING,
            post_nms_inference=cfg.RPN.POST_NMS_ROIS_INFERENCE,
            train_anchors_per_image=cfg.RPN.TRAIN_ANCHORS_PER_IMAGE,
            rpn_pos_thresh=cfg.RPN.TARGET_POS_THRES,
            rpn_neg_thresh=cfg.RPN.TARGET_NEG_THRES,
            pool_size=cfg.MRCNN.POOL_SIZE,
            mask_pool_size=cfg.MRCNN.MASK_POOL_SIZE,
            mask_shape=tuple(cfg.MRCNN.MASK_SHAPE),
            rois_per_image=cfg.ROIS.TRAIN_ROIS_PER_IMAGE,
            positive_ratio=cfg.ROIS.ROI_POSITIVE_RATIO,
            assign_base=cfg.ROIS.ASSIGN_ANCHOR_BASE,
            roi_method=cfg.ROIS.METHOD,
            roi_pool_window_cap=cfg.ROIS.get("WINDOW_CAP", 8),
            use_mini_mask=cfg.MRCNN.USE_MINI_MASK,
            bbox_std=tuple(float(x) for x in cfg.DATA.BBOX_STD_DEV),
            det_max_instances=cfg.TEST.DET_MAX_INSTANCES,
            det_nms_threshold=cfg.TEST.DET_NMS_THRESHOLD,
            det_min_confidence=float(cfg.TEST.DET_MIN_CONFIDENCE),
            dev_switch=cfg.DEV.SWITCH,
            dev_structure=cfg.DEV.STRUCTURE,
            dev_loss_choice=cfg.DEV.LOSS_CHOICE,
            dev_upsample_fac=cfg.DEV.UPSAMPLE_FAC,
            dev_upsample_init=cfg.DEV.UPSAMPLE_INIT,
            dev_upsample_residual=cfg.DEV.UPSAMPLE_RESIDUAL,
            dev_multi_upsampler=cfg.DEV.MULTI_UPSAMPLER,
            dev_dis_upsampler=cfg.DEV.DIS_UPSAMPLER,
            dev_baseline=cfg.DEV.BASELINE,
            dev_big_supervise=cfg.DEV.BIG_SUPERVISE,
            dev_big_feat_detach=cfg.DEV.BIG_FEAT_DETACH,
            dev_assign_all_scale=cfg.DEV.ASSIGN_BOX_ON_ALL_SCALE,
            dev_feat_pool_size=cfg.DEV.FEAT_BRANCH_POOL_SIZE,
            dev_ot_one_dim_form=cfg.DEV.OT_ONE_DIM_FORM,
            cls_merge_feat=cfg.DEV.CLS_MERGE_FEAT,
            cls_merge_manner=cfg.DEV.CLS_MERGE_MANNER,
            cls_merge_fac=cfg.DEV.CLS_MERGE_FAC,
            fpn_ot_loss=cfg.TRAIN.FPN_OT_LOSS,
            remat_backbone=bool(cfg.TPU.REMAT_BACKBONE),
            roi_window_kernel=bool(cfg.TPU.ROI_WINDOW_KERNEL),
            roi_window=int(cfg.TPU.get("ROI_WINDOW_SIZE", 32)),
            strict_quirks=bool(cfg.MODEL.STRICT_QUIRKS),
            dtype=dtype,
        )

    def _anchors(self) -> jnp.ndarray:
        shapes = [
            [int(np.ceil(self.image_size / s)), int(np.ceil(self.image_size / s))]
            for s in self.strides
        ]
        return jnp.asarray(
            generate_pyramid_anchors(
                self.anchor_scales, self.anchor_ratios, shapes, self.strides,
                self.anchor_stride,
            )
        )

    def setup(self):
        self.resnet = ResNet(self.backbone, remat=self.remat_backbone,
                             dtype=self.dtype, name="backbone")
        self.fpn = FPN(self.fpn_channels, fpn_ot_loss=self.fpn_ot_loss,
                       dtype=self.dtype, name="fpn")
        self.rpn = RPNHead(len(self.anchor_ratios), self.anchor_stride,
                           dtype=self.dtype, name="rpn")
        self.dev = Dev(
            num_classes=self.num_classes,
            pool_size=self.pool_size,
            mask_pool_size=self.mask_pool_size,
            feat_pool_size=self.dev_feat_pool_size,
            image_size=self.image_size,
            assign_base=self.assign_base,
            use_dev=self.dev_switch,
            structure=self.dev_structure,
            roi_method=self.roi_method,
            window_cap=self.roi_pool_window_cap,
            upsample_fac=self.dev_upsample_fac,
            upsample_init=self.dev_upsample_init,
            upsample_residual=self.dev_upsample_residual,
            multi_upsampler=self.dev_multi_upsampler,
            dis_upsampler=self.dev_dis_upsampler,
            loss_choice=self.dev_loss_choice,
            baseline=self.dev_baseline,
            big_supervise=self.dev_big_supervise,
            big_feat_detach=self.dev_big_feat_detach,
            assign_all_scale=self.dev_assign_all_scale,
            roi_window_kernel=self.roi_window_kernel,
            roi_window=self.roi_window,
            dtype=self.dtype,
            name="dev",
        )
        self.classifier = BoxHead(
            self.num_classes, self.pool_size,
            merge_feat=self.dev_switch and self.cls_merge_feat
            and self.dev_structure == "beta",
            merge_manner=self.cls_merge_manner,
            merge_fac=self.cls_merge_fac,
            dtype=self.dtype, name="classifier",
        )
        self.mask = MaskHead(self.num_classes, dtype=self.dtype, name="mask")
        if self.dev_switch and self.dev_loss_choice == "ot":
            self.ot_loss = OptTrans1D(1024, one_dim_form=self.dev_ot_one_dim_form,
                                      name="ot_loss", dtype=self.dtype)
        else:
            self.ot_loss = None

    def meta_ot(self, small, big, row_weights=None):
        """OT meta-loss between SMALL and BIG 1024-d sets (lib/model.py:206-207).

        Exposed for the train step via ``model.apply(vars, ..., method='meta_ot')``
        so the learnable G_net/critic live in the same param tree as the
        reference's ``ot_loss`` submodule (lib/model.py:66-67)."""
        return self.ot_loss(small, big, row_weights)

    # ------------------------------------------------------------------
    def _features_and_proposals(self, images, train: bool, train_bn: bool):
        c2, c3, c4, c5 = self.resnet(images.astype(self.dtype), train_bn)
        pyramid, fpn_ot = self.fpn(c2, c3, c4, c5, train=train, train_bn=train_bn)
        rpn_logits, rpn_probs, rpn_deltas = run_rpn_over_pyramid(self.rpn, pyramid)

        # SURVEY.md §3.5 #1: reference trains with the inference proposal count
        if train and not self.strict_quirks:
            count = self.post_nms_train
        else:
            count = self.post_nms_inference
        proposals = proposal_layer(
            rpn_probs.astype(jnp.float32),
            rpn_deltas.astype(jnp.float32),
            self._anchors(),
            jnp.asarray(self.bbox_std, jnp.float32),
            (self.image_size, self.image_size),
            pre_nms_limit=self.pre_nms_limit,
            proposal_count=count,
            nms_threshold=self.rpn_nms_threshold,
        )
        mrcnn_maps = pyramid[:4]
        return mrcnn_maps, rpn_logits, rpn_deltas, proposals, fpn_ot

    # ------------------------------------------------------------------
    def __call__(self, images, mode: str = "inference", gt_class_ids=None,
                 gt_boxes=None, gt_masks=None, windows=None,
                 train_bn: bool = False, with_masks: bool = True):
        if mode == "train":
            return self.forward_train(images, gt_class_ids, gt_boxes, gt_masks,
                                      train_bn=train_bn)
        if mode == "inference":
            return self.forward_inference(images, windows,
                                          with_masks=with_masks)
        if mode == "visualize":
            return self.forward_inference(images, windows, with_features=True)
        raise ValueError(f"unknown mode {mode!r}")

    # ------------------------------------------------------------------
    def forward_train(self, images, gt_class_ids, gt_boxes, gt_masks,
                      train_bn: bool = False):
        """gt_boxes in pixels [B,G,4]; gt_masks mini or full [B,G,mh,mw];
        gt_class_ids [B,G] (0 pad, <0 crowd). Returns a dict of losses and
        intertwiner stats (buffer update + meta-loss happen in train/step.py).
        """
        b = images.shape[0]
        maps, rpn_logits, rpn_deltas, proposals, fpn_ot = (
            self._features_and_proposals(images, train=True, train_bn=train_bn))

        anchors = self._anchors()
        std = jnp.asarray(self.bbox_std, jnp.float32)
        key_rpn = self.make_rng("sampling")
        key_det = self.make_rng("sampling")

        rpn_t = rpn_targets(
            key_rpn, anchors, gt_class_ids, gt_boxes, std,
            self.train_anchors_per_image, self.rpn_pos_thresh,
            self.rpn_neg_thresh)

        scale = jnp.array(
            [self.image_size] * 4, jnp.float32)
        det_t = detection_targets(
            key_det, jax.lax.stop_gradient(proposals), gt_class_ids,
            gt_boxes / scale, gt_masks, std,
            self.rois_per_image, self.positive_ratio, tuple(self.mask_shape),
            self.use_mini_mask)

        pooled_cls, pooled_mask, feat_out = self.dev(
            maps, det_t.rois, roi_gt=det_t.class_ids, train=True,
            train_bn=train_bn)

        small_out = feat_out["small_out"] if feat_out else None
        small_gt = feat_out["small_gt"] if feat_out else None
        logits, _, bbox, _ = self.classifier(
            pooled_cls, small_out, small_gt, train_bn=train_bn)
        masks_pred = self.mask(pooled_mask, train_bn=train_bn)

        r = self.rois_per_image
        k = self.num_classes
        mh, mw = self.mask_shape
        logits = logits.reshape(b, r, k)
        bbox = bbox.reshape(b, r, k, 4)
        masks_pred = masks_pred.reshape(b, r, mh, mw, k)

        from ..train import losses as L
        out = {
            "rpn_class_loss": L.rpn_class_loss(rpn_t.match, rpn_logits),
            "rpn_bbox_loss": L.rpn_bbox_loss(
                rpn_t.deltas, rpn_t.match, rpn_deltas),
            "mrcnn_class_loss": L.mrcnn_class_loss(det_t.class_ids, logits),
            "mrcnn_bbox_loss": L.mrcnn_bbox_loss(
                det_t.deltas, det_t.class_ids, bbox),
            "mrcnn_mask_loss": L.mrcnn_mask_loss(
                det_t.masks, det_t.class_ids, masks_pred),
            "fpn_ot_loss": fpn_ot,
        }
        if self.ot_loss is not None and self.is_initializing():
            # materialize ot_loss params during init (it's only invoked from
            # the train step via the meta_ot method otherwise)
            dummy = jnp.zeros((2, 1024), jnp.float32)
            self.meta_ot(dummy, dummy, jnp.zeros((2,), jnp.float32))

        if feat_out:
            out["intertwiner"] = {
                key: feat_out[key]
                for key in ("big_feat", "big_cnt", "small_feat", "small_cnt",
                            "big_loss", "small_out", "small_gt")
            }
        return out

    # ------------------------------------------------------------------
    def forward_inference(self, images, windows, with_features: bool = False,
                          with_masks: bool = True):
        """windows [B,4] pixel (y1,x1,y2,x2) un-padded region per sample.

        Returns dict(detections [B,M,6], masks [B,M,mh,mw] — each detection's
        own-class slice, selected on device); ``with_masks=False`` skips the
        mask branch (bbox-only eval); visualize mode returns
        dict(detections, features [B,M,1024]) without the mask branch
        (parity: lib/model.py:315-367).
        """
        b = images.shape[0]
        maps, _, _, proposals, _ = self._features_and_proposals(
            images, train=False, train_bn=False)

        if self.is_initializing():
            # materialize every mode-gated param branch during init: the
            # param tree must match a train checkpoint's regardless of which
            # mode init() ran in, or restore key-mismatches
            if self.ot_loss is not None:
                # train-path hook's twin (meta-OT generator/critic)
                dummy = jnp.zeros((2, 1024), jnp.float32)
                self.meta_ot(dummy, dummy, jnp.zeros((2,), jnp.float32))
            if with_features or not with_masks:
                # visualize / bbox-only eval skip the mask branch at runtime
                self.mask(jnp.zeros(
                    (1, self.mask_pool_size, self.mask_pool_size,
                     self.fpn_channels), self.dtype))

        # the mask pooling of this call is only consumed by the critic, and
        # the critic only when CLS_MERGE_FEAT mixes small features into the
        # classifier (or in visualize mode for parity of dumped features)
        need_small = (self.dev_switch and self.cls_merge_feat
                      and self.dev_structure == "beta") or with_features
        pooled_cls, _, feat_out = self.dev(
            maps, proposals, roi_gt=None, train=False,
            need_cls=True, need_mask=False, need_small=need_small)
        small_out = feat_out["small_out"] if feat_out else None
        small_gt = feat_out["small_gt"] if feat_out else None
        _, probs, bbox, cls_feat = self.classifier(pooled_cls, small_out, small_gt)

        r = proposals.shape[1]
        probs = probs.reshape(b, r, self.num_classes)
        bbox = bbox.reshape(b, r, self.num_classes, 4)

        detections, keep_idx, keep_valid = detection_layer(
            proposals, probs, bbox, windows.astype(jnp.float32),
            jnp.asarray(self.bbox_std, jnp.float32),
            (self.image_size, self.image_size),
            max_instances=self.det_max_instances,
            nms_threshold=self.det_nms_threshold,
            min_confidence=self.det_min_confidence,
        )

        if with_features:
            feats = cls_feat.reshape(b, r, -1)
            out_feat = jnp.take_along_axis(
                feats, keep_idx[..., None], axis=1)
            out_feat = out_feat * keep_valid[..., None].astype(out_feat.dtype)
            return {"detections": detections, "features": out_feat}

        if not with_masks:
            # bbox-only evaluation: skip the mask pooling + head entirely
            return {"detections": detections}

        det_boxes = detections[..., :4] / jnp.array(
            [self.image_size] * 4, jnp.float32)
        _, pooled_mask, _ = self.dev(maps, det_boxes, roi_gt=None, train=False,
                                     need_cls=False, need_mask=True,
                                     need_small=False)
        masks = self.mask(pooled_mask)
        mh, mw = self.mask_shape
        masks = masks.reshape(b, self.det_max_instances, mh, mw, self.num_classes)
        # select each detection's class slice ON DEVICE: the host only ever
        # consumes masks[i, :, :, class_i] (unmold_detections), and shipping
        # [B, M, mh, mw, K] over D2H is K x the needed bytes — with K=81 that
        # transfer dominated end-to-end eval (~813MB/chunk at batch 32)
        cls_sel = detections[..., 4].astype(jnp.int32)          # [B, M]
        masks = jnp.take_along_axis(
            masks, cls_sel[:, :, None, None, None], axis=-1)[..., 0]
        return {"detections": detections, "masks": masks}       # [B,M,mh,mw]
