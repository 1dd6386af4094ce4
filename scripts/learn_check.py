#!/usr/bin/env python
"""End-to-end learning check: overfit 8 synthetic images for 200 steps on
one chip and report COCO bbox AP (expected AP50 > 0.9, AP > 0.6). Validates
targets, losses, intertwiner, optimizer, detection and COCOeval together."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, numpy as np, jax, jax.numpy as jnp, tempfile
from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.data import get_data, synthetic
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.train.step import create_train_state, make_train_step
from feature_intertwiner_tpu.train.optim import learning_rate
from feature_intertwiner_tpu.train.workflow import test_model

root = tempfile.mkdtemp()
synthetic.generate(root, num_images=8, size=(192, 256), seed=5)

cfg = build_config()
cfg.CTRL.QUICK_VERIFY = True
cfg.MODEL.BACKBONE = "resnet50"
cfg.DATA.IMAGE_MIN_DIM = 200
cfg.DATA.IMAGE_MAX_DIM = 256
cfg.DATA.MAX_GT_INSTANCES = 8
cfg.RPN.ANCHOR_SCALES = (16, 32, 64, 128, 256)
cfg.RPN.PRE_NMS_LIMIT = 1000
cfg.RPN.POST_NMS_ROIS_INFERENCE = 200
cfg.ROIS.TRAIN_ROIS_PER_IMAGE = 64
cfg.TEST.DET_MAX_INSTANCES = 16
cfg.TEST.DET_MIN_CONFIDENCE = 0.5
cfg.TRAIN.BATCH_SIZE = 8
cfg.TRAIN.INIT_LR = 0.002
cfg.DEV.SWITCH = True
# meta-loss variant override for hardware checks: LOSS_CHOICE=ot|l1|kl|l2
cfg.DEV.LOSS_CHOICE = os.environ.get("LOSS_CHOICE", "l2")
cfg.DEV.BUFFER_SIZE = 1
cfg.DEV.UPSAMPLE_FAC = 1.0
cfg.DEV.LOSS_FAC = 1.0
cfg.finalize()
cfg.MISC.RESULT_FOLDER = tempfile.mkdtemp()

loader, val, val_api = get_data(cfg, data_root=root)
cfg.DATASET.NUM_CLASSES = val.num_classes
model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
g = cfg.DATA.MAX_GT_INSTANCES

batches = list(loader)  # one batch of all 8 images
batch = {k: jnp.asarray(v) for k, v in batches[0].items() if k != "image_meta"}

variables = jax.jit(lambda: model.init(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    batch["images"][:1], mode="train", gt_class_ids=batch["gt_class_ids"][:1],
    gt_boxes=batch["gt_boxes"][:1], gt_masks=batch["gt_masks"][:1]))()
state = create_train_state(cfg, variables)
step = jax.jit(make_train_step(model, cfg, "all"))

t0=time.time()
rng = jax.random.PRNGKey(42)
for it in range(1, 201):
    rng, sub = jax.random.split(rng)
    state, metrics = step(state, batch, jnp.float32(cfg.TRAIN.INIT_LR), jnp.float32(1.0), sub)
    if it in (1, 25, 50, 100, 150, 200):
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        print(f"it {it}: total {m['total_loss']:.3f} rpn_c {m['rpn_class_loss']:.3f} "
              f"rpn_b {m['rpn_bbox_loss']:.3f} cls {m['mrcnn_class_loss']:.3f} "
              f"bbox {m['mrcnn_bbox_loss']:.3f} mask {m['mrcnn_mask_loss']:.3f} meta {m['meta_loss']:.4f}", flush=True)
print(f"train time {time.time()-t0:.1f}s", flush=True)

eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
stats = test_model(model, eval_vars, cfg, val, val_api, epoch=99,
                   eval_masks=True)
print("bbox AP:", round(float(stats[0]), 3), "AP50:", round(float(stats[1]), 3), flush=True)

# bf16-vs-fp32 numerics audit (the TEST.DTYPE eval-precision option): same
# params, fp32 compute; report the AP delta vs the bf16 eval above.
stats32 = test_model(model.clone(dtype=jnp.float32), eval_vars, cfg, val,
                     val_api, epoch=98)
print("fp32-eval bbox AP:", round(float(stats32[0]), 3),
      "AP50:", round(float(stats32[1]), 3),
      "| delta vs bf16 eval:", round(float(stats32[0] - stats[0]), 4), flush=True)

# multi-scale testing (TEST.MULTI_SCALE cross-scale fusion) on the same model
if os.environ.get("MULTI_SCALE", "1") != "0":
    cfg.TEST.MULTI_SCALE = [192, 256, 320]
    stats_ms = test_model(model, eval_vars, cfg, val, val_api, epoch=97)
    print("multi-scale bbox AP:", round(float(stats_ms[0]), 3),
          "AP50:", round(float(stats_ms[1]), 3),
          "| delta vs single-scale:", round(float(stats_ms[0] - stats[0]), 4),
          flush=True)
