"""Dev — the Feature Intertwiner RoI stage, redesigned for static shapes.

Capability parity with ``Dev`` (``/root/reference/lib/sub_module.py:286-692``,
``structure='beta'`` — the only structure the reference implements; 'alpha' is
unreachable/crashes there, SURVEY.md §3.5 #2, and raises here).

The reference loops over pyramid levels with dynamic per-level RoI subsets and
a per-class Python aggregation loop (:429-617, :664-684). TPU-first redesign:

- level assignment is *data* ([B·R] int32), not control flow;
- pooling is one fused multilevel gather (ops/roi_align.py) over the
  **upsampled** ("make-up layer") maps for the small path — every RoI is
  "small" at exactly its assigned level;
- the reliable ("big") sets are per-meta-level masks over the same RoI array;
  big features pool from the *non-upsampled* level map (sub_module.py:498-507)
  with one single-level crop per meta level;
- per-class mean aggregation (``_assign_feat2cls``) becomes a one-hot matmul
  (``vecsᵀ @ onehot``) — an MXU contraction instead of a class loop;
- small 1024-d outputs are returned **aligned to RoI order** (the reference
  packs them in level-processing order, which misaligns the CLS_MERGE_FEAT
  addition in the classifier — see models/heads.py docstring).

Reference behavioral details preserved:
- meta levels are {2,3,4} (``_use_meta``, :434-437); level-5 RoIs contribute
  no small stats and keep zero small vectors;
- big sets per level l: l=2→{3,4,5}, l=3→{4,5}, l=4→{5} (``_find_big_box2``);
- big stats at a level are zeroed when that level has no small RoIs
  (:456-467 ``continue`` skips big processing too);
- ``BIG_FEAT_DETACH`` stops gradients into the reliable set;
- ``DEV.BASELINE`` runs the upsampler but no critic/stats;
- ``ASSIGN_BOX_ON_ALL_SCALE`` assigns by area vs. the RoI-output footprint
  per level (:440-454), with the big-only remainder merged into the last
  level at inference.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.roi_align import (
    assign_fpn_level,
    crop_and_resize,
    multilevel_crop_and_resize,
)
from ..ops.roi_align_window import (
    hybrid_unfit_overflow,
    multilevel_crop_and_resize_window,
)
from ..ops.roi_pool import make_roi_pool_input, roi_pool
from .common import BN, conv, dense

META_LEVELS = (2, 3, 4)


def class_mean(
    vecs: jax.Array, gts: jax.Array, mask: jax.Array, num_classes: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-class masked mean — the reference's ``_assign_feat2cls``
    (sub_module.py:664-684) as one MXU contraction.

    vecs [N, D], gts [N] int, mask [N] bool -> (feat [D, K], cnt [1, K]);
    background (class 0) excluded; absent classes give zero columns.
    """
    onehot = jax.nn.one_hot(gts, num_classes, dtype=vecs.dtype)
    onehot = onehot * mask.astype(vecs.dtype)[:, None]
    onehot = onehot.at[:, 0].set(0.0)
    cnt = jnp.sum(onehot, axis=0)                          # [K]
    sums = vecs.T @ onehot                                 # [D, K]
    feat = jnp.where(cnt[None, :] > 0, sums / jnp.maximum(cnt, 1.0)[None, :], 0.0)
    return feat, cnt[None, :]


def _identity_conv_init(key, shape, dtype):
    """Delta kernel: conv(x) == x at init (kernel [kh,kw,cin,cout])."""
    kh, kw, cin, cout = shape
    k = jnp.zeros(shape, dtype)
    return k.at[kh // 2, kw // 2].set(jnp.eye(cin, cout, dtype=dtype))


def _bilinear_deconv_init(key, shape, dtype):
    """Per-channel bilinear-upsampling kernel for a stride-2 ConvTranspose:
    deconv(x) == bilinear 2× upsample of x at init. For the 3×3 kernel the
    per-axis taps are [0.5, 1, 0.5] (even output cells copy, odd ones
    average neighbours)."""
    kh, kw, cin, cout = shape

    def taps(n, stride=2):
        c = (n - 1) / 2.0
        return 1.0 - jnp.abs(jnp.arange(n, dtype=jnp.float32) - c) / stride

    w2d = taps(kh)[:, None] * taps(kw)[None, :]
    eye = jnp.eye(cin, cout, dtype=jnp.float32)
    return (w2d[:, :, None, None] * eye[None, None]).astype(dtype)


class UpsampleBlock(nn.Module):
    """The "make-up layer" (sub_module.py:309-327): conv (fac 1) or 2×
    ConvTranspose (fac 2), + BN + ReLU.

    ``init_mode='identity'`` is the warm-graft mitigation (VERDICT r2 #5):
    grafting a fresh Dev onto a converged ``DEV.SWITCH=False`` baseline
    re-routes every small-RoI pooling through this block, and a random
    kernel destroys the converged feature path at step 0 (measured
    −0.04…−0.06 AP at small fine-tune budgets). With 'identity' the conv is
    a delta kernel / the deconv a bilinear-upsampling kernel and BN starts
    at identity (scale 1, bias 0, running stats (0, 1)), so at init the
    block computes ``relu(x)`` / ``relu(bilinear2×(x))`` — the converged
    path survives up to ReLU clipping of negative activations.
    ``residual=True`` closes that last gap: the block returns
    ``base + gate·(block(x) − base)`` with a zero-initialized per-channel
    gate (base = x, or its bilinear 2× upsample for fac 2) — exact identity
    at init, and the gate lets training interpolate toward the learned
    make-up feature. Both are opt-in extensions; defaults match the
    reference exactly."""

    channels: int
    factor: float = 2.0
    init_mode: str = "xavier"   # 'xavier' (reference) | 'identity'
    residual: bool = False      # zero-init gated residual around the block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        if self.init_mode not in ("xavier", "identity"):
            raise ValueError(f"UPSAMPLE_INIT must be xavier|identity, "
                             f"got {self.init_mode}")
        identity = self.init_mode == "identity"
        if self.factor == 1.0:
            y = conv(self.channels, 3, name="conv", dtype=self.dtype,
                     kernel_init=_identity_conv_init if identity else None)(x)
        elif self.factor == 2.0:
            y = nn.ConvTranspose(
                self.channels, (3, 3), strides=(2, 2), padding="SAME",
                name="deconv", dtype=self.dtype,
                kernel_init=(_bilinear_deconv_init if identity
                             else nn.initializers.xavier_normal()),
            )(x)
        else:
            raise ValueError(f"UPSAMPLE_FAC must be 1 or 2, got {self.factor}")
        # torch-default BN (sub_module.py:322 passes no eps/momentum)
        y = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
               name="bn")(y, train_bn)
        y = nn.relu(y)
        if self.residual:
            base = x if self.factor == 1.0 else jax.image.resize(
                x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                method="bilinear").astype(y.dtype)
            gate = self.param("gate", nn.initializers.zeros,
                              (self.channels,), jnp.float32)
            y = base + gate.astype(y.dtype) * (y - base)
        return y


class Critic(nn.Module):
    """feat_extract (sub_module.py:330-345): 3 convs to a 1024-d vector."""

    feat_pool_size: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, train_bn: bool = False) -> jax.Array:
        """pooled [N, fp, fp, C] -> [N, 1024] (pre-last_op)."""
        k = self.feat_pool_size // 2
        x = conv(512, 3, strides=2, name="conv1", dtype=self.dtype)(pooled)
        x = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
               name="bn1")(x, train_bn)
        x = nn.relu(x)
        x = conv(1024, k, padding="VALID", name="conv2", dtype=self.dtype)(x)
        x = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
               name="bn2")(x, train_bn)
        x = nn.relu(x)
        x = conv(1024, 1, padding="VALID", name="conv3", dtype=self.dtype)(x)
        x = BN(dtype=self.dtype, epsilon=1e-5, momentum=0.9,
               name="bn3")(x, train_bn)
        x = nn.relu(x)
        return x.reshape(x.shape[0], 1024)


class Dev(nn.Module):
    """The intertwiner RoI stage. See module docstring."""

    num_classes: int = 81
    pool_size: int = 7
    mask_pool_size: int = 14
    feat_pool_size: int = 14
    image_size: int = 1024
    assign_base: float = 224.0
    use_dev: bool = True
    structure: str = "beta"
    roi_method: str = "roi_align"
    # roi_pool per-bin window bound; 0 = exact per level (ROIS.WINDOW_CAP)
    window_cap: int = 8
    upsample_fac: float = 2.0
    upsample_init: str = "xavier"
    upsample_residual: bool = False
    multi_upsampler: bool = False
    dis_upsampler: bool = False
    loss_choice: str = "l1"
    baseline: bool = False
    big_supervise: bool = False
    big_feat_detach: bool = True
    assign_all_scale: bool = False
    # TPU.ROI_WINDOW_KERNEL: window-DMA Pallas multilevel pooling
    # (ops/roi_align_window.py, 1.26-1.62x on v5e; hybrid-exact fallback)
    roi_window_kernel: bool = False
    # TPU.ROI_WINDOW_SIZE: static DMA window side (cells). Must be a
    # multiple of 8 (sublane alignment). The kernel is resolution-general
    # (short maps are zero-padded per axis); only a pyramid whose base map
    # is under twice this side falls back to pure XLA (tiny images). The
    # actual window is rectangular — (side, side+8) — the +8 x-pad absorbs
    # the sublane-aligned DMA origin's worst-case 7-cell loss, which
    # otherwise unfits the upper size band of every FPN level (measured:
    # 97.4% -> 99.6% fit on a log-uniform ar<=3 RoI mix). The inference
    # classifier pooling adds wide-flat/tall-thin shape-class windows
    # derived from this side (ops/roi_align_window.py::shape_class_windows).
    roi_window: int = 32
    dtype: Any = jnp.float32

    def _sow_unfit_overflow(self, feats, flat_rois, level_idx, crops,
                            window=(32, 40), divs=None, classed=None):
        """Surface the window-hybrid's silent-degradation counter
        (ops/roi_align_window.py::hybrid_unfit_overflow) into the
        'diagnostics' collection — harvested by train/step.py and
        test_model into metrics.jsonl (VERDICT r3 #3). No-op unless the
        window kernel is on and 'diagnostics' is mutable. ``divs`` /
        ``classed`` align each crop's fallback budget divisor and
        shape-classes flag to the matching pooling call so the counter
        measures exactly what the pooling silently truncates."""
        if not self.roi_window_kernel or self.is_initializing():
            return
        if divs is None:
            divs = [16] * len(crops)
        if classed is None:
            classed = [False] * len(crops)
        ov = jnp.zeros((), jnp.int32)
        for crop, div, sc in zip(crops, divs, classed):
            ov = ov + hybrid_unfit_overflow(
                feats, flat_rois, level_idx, (crop, crop), window,
                fallback_div=div, shape_classes=sc)
        self.sow("diagnostics", "roi_unfit_overflow", ov,
                 init_fn=lambda: jnp.zeros((), jnp.int32),
                 reduce_fn=lambda a, b: a + b)

    def _last_op(self, x: jax.Array) -> jax.Array:
        if self.loss_choice in ("l1", "l2"):
            return nn.sigmoid(x)
        if self.loss_choice == "kl":
            return jax.nn.softmax(x, axis=1)
        return x  # 'ot': no last op (sub_module.py:347-350)

    def _assign_levels(self, flat_rois: jax.Array, widths: Sequence[int]):
        """Returns (level [N] in 2..6, meta_levels). Level 6 = big-on-all
        (only possible with ASSIGN_BOX_ON_ALL_SCALE)."""
        if not self.assign_all_scale:
            lvl = assign_fpn_level(
                flat_rois, (self.image_size, self.image_size), base=self.assign_base
            )
            return lvl, META_LEVELS
        h = flat_rois[:, 2] - flat_rois[:, 0]
        w = flat_rois[:, 3] - flat_rois[:, 1]
        area = h * w
        lvl = jnp.full(flat_rois.shape[:1], 6, jnp.int32)
        for i, width in reversed(list(enumerate(widths))):
            thres = (self.feat_pool_size / width) ** 2
            lvl = jnp.where(area <= thres, i + 2, lvl)
        return lvl, (2, 3, 4, 5)

    @staticmethod
    def _big_mask(level_id: int, lvl: jax.Array, all_scale: bool) -> jax.Array:
        """_find_big_box2 (sub_module.py:366-378) as a data mask."""
        if all_scale:
            return lvl > level_id
        if level_id == 2:
            return (lvl >= 3) & (lvl <= 5)
        if level_id == 3:
            return (lvl >= 4) & (lvl <= 5)
        if level_id == 4:
            return lvl == 5
        return jnp.zeros_like(lvl, dtype=bool)

    @nn.compact
    def __call__(
        self,
        feats: List[jax.Array],
        rois: jax.Array,
        roi_gt: Optional[jax.Array] = None,
        train: bool = False,
        train_bn: bool = False,
        need_cls: bool = True,
        need_mask: bool = True,
        need_small: bool = True,
    ):
        """feats: [P2..P5] NHWC; rois [B, R, 4] normalized; roi_gt [B, R] int.

        Returns (pooled_cls [B·R,P,P,C], pooled_mask [B·R,M,M,C], feat_out):
        train: feat_out = dict(big_feat [S,1024,K], big_cnt [S,1,K],
        small_feat, small_cnt, big_loss [S], small_out [B·R,1024],
        small_gt [B·R]); inference: dict(small_out, small_gt); None when
        the intertwiner is off.

        ``need_cls`` / ``need_mask`` / ``need_small`` skip unused pooling and
        critic work (static flags — e.g. the inference mask pass needs only
        pooled_mask; the reference recomputes everything on both of its
        ``dev_roi`` calls, lib/model.py:319,338). All branches still run
        during init so the param tree is stable.
        """
        if self.use_dev and self.structure != "beta":
            raise NotImplementedError(
                "Only structure='beta' exists (the reference's 'alpha' branch "
                "is unimplemented and crashes there too — lib/model.py:424-425)"
            )
        if self.is_initializing():
            need_cls = need_mask = need_small = True
        b, r, _ = rois.shape
        flat_rois = rois.reshape(-1, 4)
        box_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        image_shape = (self.image_size, self.image_size)

        ml_pool = (multilevel_crop_and_resize_window if self.roi_window_kernel
                   else multilevel_crop_and_resize)
        base_win = (self.roi_window, self.roi_window + 8)
        base_kw = ({"window": base_win} if self.roi_window_kernel else {})
        # The inference classifier pools the full 1000-proposal list whose
        # low-score noise tail has arbitrary aspect ratios (~12.7%
        # window-unfit at the single (32, 40) window) — it runs with the
        # wide-flat/tall-thin SHAPE CLASSES on (shape_class_windows), so
        # extreme aspects pool in-kernel and the exact-XLA fallback budget
        # stays at n//16 (round 4 paid n//4 ≈ 8% R50 throughput for the
        # same exactness guarantee — VERDICT r4 #3; the detection-level
        # guarantee is re-audited in results/audit/roi_window_audit.json).
        # Train pooling keeps single-class n//16: the unfit boxes there
        # are sampled NEGATIVES early in training (their truncated
        # features still train "background"), the multi-class backward
        # would route through the XLA transpose (roi_align_window.py::
        # _hybrid_bwd), and a measured n//4 train budget cost 27% step
        # time without converging better — same seeds/steps on the
        # 32-image audit val: the n//4-trained model (audit v6,
        # results/audit/prod_window_*/metrics.jsonl) scored AP
        # 0.333-0.338, the n//16-trained model (audit v5,
        # results/audit/roi_window_audit.json) 0.405-0.411; separately
        # trained 32-image evals carry large variance, so this reads as
        # "no better", not a measured 0.07 regression. The train-side
        # counter keeps the truncation visible either way.
        cls_div = 16
        mask_div = 16
        cls_classed = not train
        cls_kw = ({**base_kw, "fallback_div": cls_div,
                   "shape_classes": cls_classed}
                  if self.roi_window_kernel else {})

        if not self.use_dev:
            pooled_cls = ml_pool(
                feats, flat_rois, box_idx, (self.pool_size,) * 2, image_shape,
                assign_base=self.assign_base,
                **cls_kw) if need_cls else None
            mask_kw = ({**base_kw, "fallback_div": mask_div}
                       if self.roi_window_kernel else {})
            pooled_mask = ml_pool(
                feats, flat_rois, box_idx, (self.mask_pool_size,) * 2,
                image_shape, assign_base=self.assign_base,
                **mask_kw) if need_mask else None
            self._sow_unfit_overflow(
                feats, flat_rois,
                assign_fpn_level(flat_rois, image_shape,
                                 base=self.assign_base) - 2,
                ([self.pool_size] if need_cls else [])
                + ([self.mask_pool_size] if need_mask else []),
                window=base_win,
                divs=([cls_div] if need_cls else [])
                + ([mask_div] if need_mask else []),
                classed=([cls_classed] if need_cls else []) + (
                    [False] if need_mask else []))
            return pooled_cls, pooled_mask, None

        lvl, meta_levels = self._assign_levels(
            flat_rois, [f.shape[2] for f in feats])

        # --- make-up layers --------------------------------------------------
        if self.dis_upsampler:
            ups = list(feats)
        elif self.multi_upsampler:
            ups = [
                UpsampleBlock(feats[i].shape[-1], self.upsample_fac,
                              init_mode=self.upsample_init,
                              residual=self.upsample_residual,
                              name=f"upsample{i}", dtype=self.dtype)(feats[i], train_bn)
                for i in range(4)
            ]
        else:
            shared = UpsampleBlock(feats[0].shape[-1], self.upsample_fac,
                                   init_mode=self.upsample_init,
                                   residual=self.upsample_residual,
                                   name="upsample0", dtype=self.dtype)
            ups = [shared(f, train_bn) for f in feats]

        # --- pooled features for the heads (small path, upsampled maps) -----
        need_pooled_mask = need_mask or (need_small and not self.baseline)
        level_idx = jnp.clip(lvl, 2, 5) - 2
        pooled_cls = pooled_mask = None
        # Upsampled maps multiply every box's cell span by upsample_fac, so
        # the window-DMA kernel's static window must scale with it or the
        # unfit rate explodes past the hybrid's exact-XLA fallback budget
        # (silently tap-truncated features for the overflow boxes).
        pool_kw = dict(base_kw)
        if (self.roi_window_kernel and self.upsample_fac > 1.0
                and not self.dis_upsampler):
            w = self.roi_window * int(-(-self.upsample_fac // 1))  # × ceil(fac)
            pool_kw = {"window": (w, w + 8)}
        if self.roi_method == "roi_align":
            if need_cls:
                kw = ({**pool_kw, "fallback_div": cls_div,
                       "shape_classes": cls_classed}
                      if self.roi_window_kernel else pool_kw)
                pooled_cls = ml_pool(
                    ups, flat_rois, box_idx, (self.pool_size,) * 2,
                    image_shape, level_idx=level_idx, **kw)
            if need_pooled_mask:
                kw = ({**pool_kw, "fallback_div": mask_div}
                      if self.roi_window_kernel else pool_kw)
                pooled_mask = ml_pool(
                    ups, flat_rois, box_idx, (self.mask_pool_size,) * 2,
                    image_shape, level_idx=level_idx, **kw)
            self._sow_unfit_overflow(
                ups, flat_rois, level_idx,
                ([self.pool_size] if need_cls else [])
                + ([self.mask_pool_size] if need_pooled_mask else []),
                window=pool_kw.get("window", (32, 40)),
                divs=([cls_div] if need_cls else [])
                + ([mask_div] if need_pooled_mask else []),
                classed=([cls_classed] if need_cls else []) + (
                    [False] if need_pooled_mask else []))
        elif self.roi_method == "roi_pool":
            if need_cls:
                pooled_cls = self._roi_pool_multilevel(
                    ups, flat_rois, box_idx, level_idx, self.pool_size)
            if need_pooled_mask:
                pooled_mask = self._roi_pool_multilevel(
                    ups, flat_rois, box_idx, level_idx, self.mask_pool_size)
        else:
            raise ValueError(self.roi_method)

        if self.assign_all_scale and train:
            # big-only RoIs (lvl==6) get no small pooled features in training
            gate = (lvl <= 5)[:, None, None, None]
            if pooled_cls is not None:
                pooled_cls = pooled_cls * gate.astype(pooled_cls.dtype)
            if pooled_mask is not None:
                pooled_mask = pooled_mask * gate.astype(pooled_mask.dtype)

        if self.baseline or not need_small:
            return pooled_cls, pooled_mask, None

        # --- critic on the shared 14² pooling (small path) -------------------
        critic = Critic(self.feat_pool_size, dtype=self.dtype, name="critic")
        small_raw = critic(pooled_mask, train_bn).astype(jnp.float32)  # [BR,1024]
        small_act = self._last_op(small_raw)

        meta_mask = jnp.zeros_like(lvl, dtype=bool)
        for l in meta_levels:
            meta_mask = meta_mask | (lvl == l)
        train_phase = roi_gt is not None
        if self.assign_all_scale and not train_phase:
            # inference merges the big-on-all remainder (lvl 6) into the
            # level-5 small set (sub_module.py:451-454) so CLS_MERGE_FEAT /
            # visualize see real critic features for large RoIs too
            meta_mask = meta_mask | (lvl == 6)
        small_out = jnp.where(meta_mask[:, None], small_act, 0.0)
        if not train_phase:
            if self.big_supervise and self.is_initializing():
                # materialize big_fc during inference-mode init too: the
                # flax param tree must not depend on which mode init() was
                # called with, or restoring a train checkpoint into an
                # inference-initialized skeleton key-mismatches (the FPN OT
                # branch handles init the same way)
                dense(self.num_classes, name="big_fc",
                      dtype=self.dtype)(small_raw[:1].astype(self.dtype))
            small_gt = meta_mask.astype(jnp.float32)
            return pooled_cls, pooled_mask, {
                "small_out": small_out, "small_gt": small_gt}

        flat_gt = roi_gt.reshape(-1).astype(jnp.int32)
        small_gt = jnp.where(meta_mask, flat_gt, 0).astype(jnp.float32)

        big_fc = (dense(self.num_classes, name="big_fc", dtype=self.dtype)
                  if self.big_supervise else None)

        small_feats, small_cnts, big_feats, big_cnts, big_losses = [], [], [], [], []
        for level_id in meta_levels:
            s_mask = lvl == level_id
            sf, sc = class_mean(small_act, flat_gt, s_mask, self.num_classes)
            small_feats.append(sf)
            small_cnts.append(sc)

            # Reliable set: pool *all* RoIs from this level's raw map once,
            # aggregate under the big mask. (sub_module.py:489-518)
            b_mask = self._big_mask(level_id, lvl, self.assign_all_scale)
            level_map = feats[level_id - 2]
            if self.roi_method == "roi_align":
                pooled_big = crop_and_resize(
                    level_map, flat_rois, box_idx, (self.feat_pool_size,) * 2)
            else:
                scale = level_map.shape[1] / self.image_size
                pooled_big = roi_pool(
                    level_map,
                    make_roi_pool_input(flat_rois, box_idx, float(self.image_size)),
                    scale, (self.feat_pool_size,) * 2,
                    window_cap=self._pool_cap(level_map.shape[1],
                                              self.feat_pool_size))
            big_raw = critic(pooled_big, train_bn).astype(jnp.float32)
            big_act = self._last_op(big_raw) if self.loss_choice != "ot" else big_raw

            # parity: when a level has no small RoIs, its big stats are
            # skipped too (sub_module.py:456-467)
            level_has_small = jnp.any(s_mask).astype(jnp.float32)
            bf, bc = class_mean(big_act, flat_gt, b_mask, self.num_classes)
            bf = bf * level_has_small
            bc = bc * level_has_small
            if self.big_feat_detach:
                bf = jax.lax.stop_gradient(bf)
            big_feats.append(bf)
            big_cnts.append(bc)

            if self.big_supervise:
                logits = big_fc(big_raw).astype(jnp.float32)
                ce = -jax.nn.log_softmax(logits)[
                    jnp.arange(logits.shape[0]), flat_gt]
                w = b_mask.astype(jnp.float32) * level_has_small
                big_losses.append(jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0))
            else:
                big_losses.append(jnp.zeros(()))

        feat_out = {
            "big_feat": jnp.stack(big_feats),        # [S, 1024, K]
            "big_cnt": jnp.stack(big_cnts),          # [S, 1, K]
            "small_feat": jnp.stack(small_feats),
            "small_cnt": jnp.stack(small_cnts),
            "big_loss": jnp.stack(big_losses),       # [S]
            "small_out": small_out,                  # [B·R, 1024] RoI-aligned
            "small_gt": small_gt,                    # [B·R]
        }
        return pooled_cls, pooled_mask, feat_out

    def _pool_cap(self, cells: int, pooled: int) -> int:
        """Static roi_pool window bound: configured cap, or exact-per-level
        (worst-case bin span of a full-image RoI) when window_cap == 0.
        Divergence at the default 8 is measured in
        scripts/profile_roipool_cap.py (P2-only, ~2-4% mean rel-err on the
        reliable-set's cross-level windows)."""
        return self.window_cap if self.window_cap else cells // pooled + 2

    def _roi_pool_multilevel(self, maps, flat_rois, box_idx, level_idx, size):
        """RoIPool every RoI at all levels, select by assignment (static)."""
        outs = []
        for i, m in enumerate(maps):
            scale = m.shape[1] / self.image_size
            rois_px = make_roi_pool_input(flat_rois, box_idx, float(self.image_size))
            outs.append(roi_pool(m, rois_px, scale, (size, size),
                                 window_cap=self._pool_cap(m.shape[1], size)))
        stacked = jnp.stack(outs)                          # [4, N, s, s, C]
        sel = jax.nn.one_hot(level_idx, 4, axis=0, dtype=stacked.dtype)
        return jnp.einsum("ln,lnhwc->nhwc", sel, stacked)
