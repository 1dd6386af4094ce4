"""Failure-mode diagnosis for a trained ablation checkpoint (CPU).

Separates the detection pipeline into stages and reports, over a few
held-out images:
  - RPN proposal recall @ IoU 0.5 (small vs large GT separately)
  - final-detection best IoU per GT and the predicted class at that match
so a low AP can be attributed to localization (RPN/refine) vs
classification (the head / intertwiner's actual target).

Usage: python scripts/diagnose_det.py <run_folder> [n_images]
  e.g. python scripts/diagnose_det.py results/ablation/l2_s0 8
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from feature_intertwiner_tpu.config import build_config  # noqa: E402
from feature_intertwiner_tpu.data import get_data  # noqa: E402
from feature_intertwiner_tpu.models import InterNet  # noqa: E402
from feature_intertwiner_tpu.ops.boxes import iou_matrix  # noqa: E402
from feature_intertwiner_tpu.train import checkpoint as ckpt  # noqa: E402
from feature_intertwiner_tpu.train.step import create_train_state  # noqa: E402
from feature_intertwiner_tpu.train.workflow import mold_inputs  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from ablation_check import ABLATION_DIR, build_cfg  # noqa: E402


def main():
    folder = sys.argv[1]
    n_im = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import re
    # folder layout: <variant>_s<seed>[_ft][_pc][_<free-form --tag>]
    m = re.match(r"(.+?)_s(\d+)((?:_.+)?)$",
                 os.path.basename(folder.rstrip("/")))
    assert m, f"unrecognized run folder name: {folder}"
    variant, seed, tag = m.group(1), int(m.group(2)), m.group(3)
    cfg = build_cfg(variant, seed, [16, 4, 4], folder)
    data_dir = "data_paired" if "pc" in tag.split("_") else "data"
    _, val, _ = get_data(cfg, data_root=os.path.join(ABLATION_DIR, data_dir))
    cfg.DATASET.NUM_CLASSES = val.num_classes

    model = InterNet.from_config(cfg, dtype=jnp.float32)
    sample_img = val.load_image(0)
    molded, _, windows = mold_inputs([sample_img], cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(molded), mode="inference",
                           windows=jnp.asarray(windows))
    state = create_train_state(cfg, variables)
    path = ckpt.find_last(folder)
    assert path, f"no checkpoint under {folder}"
    state, ep, it = ckpt.restore_checkpoint(path, state)
    print(f"restored {path} (ep {ep} iter {it})")
    eval_vars = {"params": state.params}
    if state.batch_stats:
        eval_vars["batch_stats"] = state.batch_stats

    @jax.jit
    def infer(im, win):
        out = model.apply(eval_vars, im, mode="inference", windows=win,
                          with_masks=False)
        _, _, _, proposals, _ = model.apply(
            eval_vars, im, False, False,
            method="_features_and_proposals")
        return {"detections": out["detections"], "proposals": proposals}

    stats = dict(small_gt=0, small_prop=0, big_gt=0, big_prop=0,
                 cls_right=0, cls_wrong=0, loc_miss=0)
    for i in range(n_im):
        img = val.load_image(i)
        mask, cls_ids = val.load_mask(i)
        if mask.size == 0:
            continue
        from feature_intertwiner_tpu.data import transforms as T
        gt_boxes = T.extract_bboxes(mask)             # [G,4] y1x1y2x2 px
        molded, _, windows = mold_inputs([img], cfg)
        out = infer(jnp.asarray(molded), jnp.asarray(windows))
        h, w = molded.shape[1:3]
        props = np.asarray(out["proposals"][0]) * [h, w, h, w]
        dets = np.asarray(out["detections"][0])
        det_boxes, det_cls, det_sc = dets[:, :4], dets[:, 4], dets[:, 5]
        det_boxes = det_boxes[det_sc > 0]
        det_cls = det_cls[det_sc > 0]

        for g, gcls in zip(gt_boxes, cls_ids):
            area = (g[2] - g[0]) * (g[3] - g[1])
            small = area < 32 * 32
            pio = np.asarray(iou_matrix(jnp.asarray(g[None].astype(np.float32)),
                                        jnp.asarray(props.astype(np.float32))))[0]
            stats["small_gt" if small else "big_gt"] += 1
            if pio.max() >= 0.5:
                stats["small_prop" if small else "big_prop"] += 1
            if len(det_boxes):
                dio = np.asarray(iou_matrix(
                    jnp.asarray(g[None].astype(np.float32)),
                    jnp.asarray(det_boxes.astype(np.float32))))[0]
                j = int(dio.argmax())
                if dio[j] >= 0.5:
                    if int(det_cls[j]) == int(gcls):
                        stats["cls_right"] += 1
                    else:
                        stats["cls_wrong"] += 1
                else:
                    stats["loc_miss"] += 1
            else:
                stats["loc_miss"] += 1

    sg, bg = max(stats["small_gt"], 1), max(stats["big_gt"], 1)
    print(f"proposal recall@0.5: small {stats['small_prop']}/{sg} "
          f"({stats['small_prop']/sg:.2f}), "
          f"large {stats['big_prop']}/{bg} ({stats['big_prop']/bg:.2f})")
    tot = max(stats["cls_right"] + stats["cls_wrong"] + stats["loc_miss"], 1)
    print(f"per-GT outcome: correct-class {stats['cls_right']/tot:.2f}, "
          f"wrong-class {stats['cls_wrong']/tot:.2f}, "
          f"no-det@0.5 {stats['loc_miss']/tot:.2f}  (n={tot})")


if __name__ == "__main__":
    main()
