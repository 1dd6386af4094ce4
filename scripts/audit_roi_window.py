#!/usr/bin/env python
"""The achievable window-RoIAlign audit (VERDICT r3 #3).

One converged checkpoint, two full COCO evals on the held-out synthetic val
set — TPU.ROI_WINDOW_KERNEL off (pure XLA gather) vs on (window-DMA Pallas
hybrid) — asserting the COCO results are identical. The hybrid is exact by
construction up to ``fallback_k`` unfit boxes (ops/roi_align_window.py), and
the runtime unfit-overflow counter recorded alongside proves no box crossed
that budget during the audit itself.

The surviving converged checkpoint (results/ablation/l2_s2_pc, 320² images)
has pyramid maps of 80/40/20/10 cells, so the audit runs the kernel with an
8-cell window (TPU.ROI_WINDOW_SIZE=8) — the same kernel/hybrid/fallback code
the 1024² production path runs with 32 (kernel-level exactness at 32 is
covered by tests/test_roi_align_window.py).

Writes results/audit/roi_window_audit.json (tracked evidence).

Usage: python scripts/audit_roi_window.py  (needs the TPU; ~2 min)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_RUN = os.path.join(REPO, "results", "ablation", "l2_s2_pc")
AUDIT_DIR = os.path.join(REPO, "results", "audit")


def run_eval(use_window, ckpt_path, data_root):
    import jax
    import jax.numpy as jnp

    from ablation_check import build_cfg
    from feature_intertwiner_tpu.data import get_data
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.train.checkpoint import restore_checkpoint
    from feature_intertwiner_tpu.train.step import create_train_state
    from feature_intertwiner_tpu.train.workflow import test_model

    tag = "window_on" if use_window else "window_off"
    folder = os.path.join(AUDIT_DIR, tag)
    cfg = build_cfg("l2", 2, [16, 4, 4], folder)
    cfg.TPU.ROI_WINDOW_KERNEL = bool(use_window)
    cfg.TPU.ROI_WINDOW_SIZE = 8  # 320² maps are 80/40/20/10 cells
    loader, val, val_api = get_data(cfg, data_root=data_root)
    cfg.DATASET.NUM_CLASSES = val.num_classes

    model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
    sample = loader.dataset[0]
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)},
        jnp.asarray(sample["images"])[None], mode="train",
        gt_class_ids=jnp.asarray(sample["gt_class_ids"])[None],
        gt_boxes=jnp.asarray(sample["gt_boxes"])[None],
        gt_masks=jnp.asarray(sample["gt_masks"])[None]))()
    state = create_train_state(cfg, variables)
    state, epoch, _ = restore_checkpoint(ckpt_path, state)

    eval_vars = {"params": state.params}
    if state.batch_stats:
        eval_vars["batch_stats"] = state.batch_stats
    stats = test_model(model, eval_vars, cfg, val, val_api, epoch=epoch,
                       eval_masks=True)
    # the eval's own metrics.jsonl row carries the overflow counter
    overflow = None
    mpath = os.path.join(folder, "metrics.jsonl")
    with open(mpath) as f:
        for line in f:
            rec = json.loads(line)
            if "roi_unfit_overflow" in rec:
                overflow = rec["roi_unfit_overflow"]
    return [float(s) for s in stats], overflow


def main():
    from feature_intertwiner_tpu.train.checkpoint import find_last

    os.makedirs(AUDIT_DIR, exist_ok=True)
    ckpt = find_last(CKPT_RUN)
    assert ckpt, f"no checkpoint under {CKPT_RUN}"
    data_root = os.path.join(REPO, "results", "ablation", "data_paired")

    stats_off, _ = run_eval(False, ckpt, data_root)
    stats_on, overflow_on = run_eval(True, ckpt, data_root)

    names = ["AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
             "AR1", "AR10", "AR100", "AR_small", "AR_medium", "AR_large"]
    max_diff = max(abs(a - b) for a, b in zip(stats_off, stats_on))
    record = {
        "checkpoint": os.path.relpath(ckpt, REPO),
        "window": 8,
        "stats_gather": dict(zip(names, stats_off)),
        "stats_window": dict(zip(names, stats_on)),
        "max_abs_stat_diff": max_diff,
        "roi_unfit_overflow_window_eval": overflow_on,
        "identical": bool(max_diff == 0.0),
    }
    out = os.path.join(AUDIT_DIR, "roi_window_audit.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record, indent=1))
    assert record["identical"], (
        f"COCO results differ between gather and window paths "
        f"(max |Δstat| = {max_diff})")
    assert overflow_on == 0, overflow_on
    print("AUDIT PASS: window kernel eval == gather eval, overflow 0")


if __name__ == "__main__":
    main()
