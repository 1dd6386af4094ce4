#!/usr/bin/env python
"""Held-out intertwiner ablation: does the meta-loss lift AP_small?

The round-1 gap (VERDICT r1 "Next round" #1): every variant had a
"trains and loss decreases" test but none showed the paper's core effect —
the reliable-set/less-reliable-set intertwiner (+ meta loss,
/root/reference/lib/model.py:143-224) improving detection, especially
AP_small (README.md:69 claims 25.4 APs vs Mask-RCNN-class baselines).

This benchmark trains to convergence (NOT overfit) on a generated
8-class shape dataset with a deliberately small-object-skewed instance mix
(data/synthetic.py::generate_rich), then evaluates on a 100-image HELD-OUT
split, comparing:

  baseline : DEV.SWITCH=False  (plain pyramid-RoI second stage)
  l2       : intertwiner, flagship recipe (configs/105: BUFFER_SIZE=1,
             LOSS_CHOICE=l2, LOSS_FAC=10)
  ot       : intertwiner with the Sinkhorn optimal-transport meta loss

Usage:
  python scripts/ablation_check.py [--variants baseline,l2,ot]
      [--seeds 0,1] [--schedule 32,8,8] [--train-n 300] [--val-n 100]

Each (variant, seed) run appends a JSON record (12 COCOeval stats) to
results/ablation/ablation_results.json and prints a final comparison table
with AP / AP50 / AP_small / AP_medium / AP_large deltas vs baseline.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABLATION_DIR = os.path.join(REPO, "results", "ablation")
DATA_SEED = 0


def ensure_dataset(root: str, train_n: int, val_n: int,
                   color_mode: str = "class"):
    import glob

    from feature_intertwiner_tpu.data import synthetic
    marker = os.path.join(root, f"generated_t{train_n}_v{val_n}.ok")
    if os.path.exists(marker):
        return
    synthetic.generate_rich(root, num_images=train_n, split="train",
                            seed=DATA_SEED, color_mode=color_mode)
    synthetic.generate_rich(root, num_images=val_n, split="minival",
                            seed=DATA_SEED + 7777, color_mode=color_mode)
    # regeneration overwrote the shared jsons: stale markers from other
    # sizes would otherwise validate a dataset that no longer exists
    for old in glob.glob(os.path.join(root, "generated_*.ok")):
        os.remove(old)
    with open(marker, "w") as f:
        f.write("ok")


def build_cfg(variant: str, seed: int, schedule, result_folder: str,
              init_npz=None, lr=None, upsample_init="xavier",
              upsample_residual=False, loss_fac=None):
    import jax.numpy as jnp  # noqa: F401  (defer jax import past argparse)

    from feature_intertwiner_tpu.config import build_config

    cfg = build_config()
    cfg.CTRL.QUICK_VERIFY = False
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.DATA.IMAGE_MIN_DIM = 320
    cfg.DATA.IMAGE_MAX_DIM = 320
    cfg.DATA.MAX_GT_INSTANCES = 8
    cfg.RPN.ANCHOR_SCALES = (8, 16, 32, 64, 128)
    cfg.RPN.PRE_NMS_LIMIT = 2000
    cfg.RPN.POST_NMS_ROIS_TRAINING = 500
    cfg.RPN.POST_NMS_ROIS_INFERENCE = 300
    cfg.ROIS.TRAIN_ROIS_PER_IMAGE = 64
    cfg.TEST.DET_MAX_INSTANCES = 50
    cfg.TEST.DET_MIN_CONFIDENCE = 0.05
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.INIT_LR = lr if lr else 0.002
    if init_npz:
        # paper-regime fine-tune: overlay pretrained weights (the reference
        # always starts from a pretrained backbone, tools/utils.py:271-313)
        cfg.MODEL.INIT_FILE_CHOICE = init_npz
    cfg.TRAIN.SCHEDULE = list(schedule)
    cfg.TRAIN.BN_LEARN = True       # from-scratch training needs live BN
    cfg.TRAIN.DO_VALIDATION = False  # evaluated explicitly below
    cfg.TRAIN.SAVE_FREQ_WITHIN_EPOCH = 1  # end-of-epoch checkpoints only
    cfg.TRAIN.KEEP_CHECKPOINTS = 2  # ~0.4 GB/save; 48-epoch arms fill disks
    # Pinned OFF for grid comparability: seeds 0-4 trained when the window
    # kernel's map-size guard made it inactive at 320² — the round-5
    # resolution-general kernel would otherwise silently switch later
    # seeds onto a different pooling numeric (bf16 matmul vs gather).
    cfg.TPU.ROI_WINDOW_KERNEL = False
    cfg.MISC.SEED = 1000 + seed

    if variant == "baseline":
        cfg.DEV.SWITCH = False
    else:
        cfg.DEV.SWITCH = True
        cfg.DEV.STRUCTURE = "beta"
        cfg.DEV.BUFFER_SIZE = 1
        cfg.DEV.LOSS_CHOICE = "l2" if variant == "l2" else variant
        # 10.0 = the configs/105 flagship recipe (lib/config.py DEV.LOSS_FAC);
        # --loss-fac overrides it for the dose-response grid (VERDICT r4 #5)
        cfg.DEV.LOSS_FAC = 10.0 if loss_fac is None else float(loss_fac)
        cfg.DEV.UPSAMPLE_FAC = 1.0
        cfg.DEV.BIG_FEAT_DETACH = True
        # warm-graft mitigation (VERDICT r2 #5): identity make-up init /
        # zero-init gated residual so the graft preserves the converged
        # small-RoI path at step 0 (models/intertwiner.py::UpsampleBlock)
        cfg.DEV.UPSAMPLE_INIT = upsample_init
        cfg.DEV.UPSAMPLE_RESIDUAL = upsample_residual
    cfg.finalize()
    cfg.MISC.RESULT_FOLDER = result_folder
    os.makedirs(result_folder, exist_ok=True)
    return cfg


def run_variant(variant: str, seed: int, schedule, data_root: str,
                init_npz=None, lr=None, run_tag="", upsample_init="xavier",
                upsample_residual=False, loss_fac=None):
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: variants/seeds share most programs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ABLATION_DIR, "xla_cache"))

    from feature_intertwiner_tpu.data import get_data
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.train.workflow import (
        Trainer, test_model, train_model)

    tag = ("_ft" if init_npz else "") + run_tag
    folder = os.path.join(ABLATION_DIR, f"{variant}_s{seed}{tag}")
    cfg = build_cfg(variant, seed, schedule, folder, init_npz=init_npz, lr=lr,
                    upsample_init=upsample_init,
                    upsample_residual=upsample_residual, loss_fac=loss_fac)
    loader, val, val_api = get_data(cfg, data_root=data_root)
    cfg.DATASET.NUM_CLASSES = val.num_classes

    model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
    sample = loader.dataset[0]
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(cfg.MISC.SEED),
         "sampling": jax.random.PRNGKey(cfg.MISC.SEED + 1)},
        jnp.asarray(sample["images"])[None], mode="train",
        gt_class_ids=jnp.asarray(sample["gt_class_ids"])[None],
        gt_boxes=jnp.asarray(sample["gt_boxes"])[None],
        gt_masks=jnp.asarray(sample["gt_masks"])[None]))()

    trainer = Trainer(model, cfg, variables).resume()
    t0 = time.time()
    if init_npz:
        # paper-regime fine-tune: the reference's 3-stage schedule
        # (main.py:65-82) — 'heads' first so gradients from the freshly
        # initialized Dev/critic modules cannot corrupt the pretrained
        # backbone before they converge, then '4+', then 'all'.
        for stage in ("heads", "4+", "all"):
            train_model(trainer, loader, stage)
    else:
        # from-scratch: everything is fresh, single 'all' stage
        train_model(trainer, loader, "all")
    train_time = time.time() - t0

    eval_vars = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        eval_vars["batch_stats"] = trainer.state.batch_stats
    stats = test_model(model, eval_vars, cfg, val, val_api,
                       epoch=trainer.epoch - 1, eval_masks=True)
    record = {
        "variant": variant + tag, "seed": seed,
        "schedule": list(schedule),
        "train_time_s": round(train_time, 1),
        "AP": float(stats[0]), "AP50": float(stats[1]),
        "AP75": float(stats[2]), "AP_small": float(stats[3]),
        "AP_medium": float(stats[4]), "AP_large": float(stats[5]),
        "stats": [float(s) for s in stats],
    }
    results_file = os.path.join(ABLATION_DIR, "ablation_results.json")
    all_results = []
    if os.path.exists(results_file):
        with open(results_file) as f:
            all_results = json.load(f)
    all_results = [r for r in all_results
                   if not (r["variant"] == variant + tag
                           and r["seed"] == seed)]
    all_results.append(record)
    with open(results_file, "w") as f:
        json.dump(all_results, f, indent=1)
        f.write("\n")
    print(f"[{variant} s{seed}] AP {record['AP']:.3f} "
          f"AP50 {record['AP50']:.3f} APs {record['AP_small']:.3f} "
          f"APm {record['AP_medium']:.3f} APl {record['AP_large']:.3f} "
          f"({train_time:.0f}s train)", flush=True)
    return record


def print_table(results):
    cols = ["AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large"]

    def regime(v):
        # everything after the base variant name groups a regime: '' (from
        # scratch), '_ft', '_pc', '_ft_pc', '_pc_<tag>', ...
        return v[len(v.split("_")[0]):]

    labels = {"": "from scratch", "_ft": "fine-tune",
              "_pc": "paired-color from scratch",
              "_ft_pc": "paired-color fine-tune"}
    by = {(r["variant"], r["seed"]): r for r in results}
    for suffix in sorted({regime(v) for v, _ in by}):
        variants = sorted({v for v, _ in by if regime(v) == suffix},
                          key=lambda v: (not v.startswith("baseline"), v))
        if not variants:
            continue
        seeds = sorted({s for v, s in by if regime(v) == suffix})
        label = labels.get(suffix, suffix.strip("_"))
        print(f"\n=== Held-out ablation [{label}] "
              f"(mean over seeds {seeds}) ===")
        base_by_seed = {}
        if not any(v.startswith("baseline") for v in variants):
            # tagged sub-regime (e.g. _ft_pc_id) with no baseline arm of its
            # own: pair against the parent regime's baseline (suffix minus
            # the trailing tag) so mitigation arms still print paired deltas
            parent = suffix.rsplit("_", 1)[0]
            pb = {s: by[(v, s)] for v, s in by
                  if v.startswith("baseline") and regime(v) == parent}
            if pb:
                base_by_seed = pb
                print(f"(paired vs baseline{parent} — the parent regime's "
                      "baseline arm)")
        for v in variants:
            rows = [by[(v, s)] for s in seeds if (v, s) in by]
            if not rows:
                continue
            mean = {c: float(np.mean([r[c] for r in rows])) for c in cols}
            if v.startswith("baseline"):
                base_by_seed = {r["seed"]: r for r in rows}
            line = (f"{v:12s} n={len(rows)} "
                    + " ".join(f"{c}={mean[c]:.3f}" for c in cols))
            print(line)
            if base_by_seed and not v.startswith("baseline"):
                # Paired per-seed deltas (same data + seed, arm is the only
                # difference) are the statistically meaningful comparison.
                paired = [r for r in rows if r["seed"] in base_by_seed]
                parts, ci_parts = [], []
                for c in ("AP", "AP_small", "AP_medium"):
                    d = np.array([r[c] - base_by_seed[r["seed"]][c]
                                  for r in paired])
                    parts.append(f"{c}={d.mean():+.3f}±{d.std(ddof=1):.3f}"
                                 f"/med{np.median(d):+.3f}"
                                 f"({(d > 0).sum()}/{d.size}+)"
                                 if d.size > 1 else f"{c}={d.mean():+.3f}")
                    if d.size > 2:
                        lo, hi, p = _paired_bootstrap(d)
                        ci_parts.append(
                            f"{c}=[{lo:+.3f},{hi:+.3f}] p≈{p:.2f}")
                print(f"{'':12s} paired Δvs-base (mean±sd, seeds positive): "
                      + " ".join(parts))
                if ci_parts:
                    print(f"{'':12s} bootstrap 95% CI of mean Δ "
                          "(10k resamples; p = 2-sided sign-flip test): "
                          + " ".join(ci_parts))
                    pw = []
                    for c in ("AP", "AP_small", "AP_medium"):
                        d = np.array([r[c] - base_by_seed[r["seed"]][c]
                                      for r in paired])
                        n_req = _seeds_to_resolve(d)
                        pw.append(f"{c}≈{n_req}")
                    print(f"{'':12s} power: seeds needed for the 95% CI to "
                          "exclude 0 at the observed mean/sd: "
                          + " ".join(pw))


def markdown_tables(results):
    """Emit the README 'Capability evidence' tables VERBATIM from the
    tracked records (VERDICT r3 #1: every README evidence number must be
    reproducible from the JSON by this tool — regenerate with
    ``python scripts/ablation_check.py --markdown`` whenever a record
    lands)."""
    by = {}
    for r in results:
        by.setdefault(r["variant"], {})[r["seed"]] = r

    def delta_cell(arm, base, col):
        seeds = sorted(set(by.get(arm, {})) & set(by.get(base, {})))
        d = np.array([by[arm][s][col] - by[base][s][col] for s in seeds])
        if d.size == 0:
            return "—", 0
        if d.size == 1:
            return f"{d[0]:+.3f} (n=1)", 1
        cell = (f"{d.mean():+.3f} ± {d.std(ddof=1):.3f}, "
                f"{(d > 0).sum()}/{d.size} seeds positive")
        if d.size > 2:
            lo, hi, p = _paired_bootstrap(d)
            cell += f", CI [{lo:+.3f}, {hi:+.3f}], p≈{p:.2f}"
        return cell, d.size

    def ap_cell(arm):
        rows = by.get(arm, {})
        if not rows:
            return "—"
        m = float(np.mean([r["AP"] for r in rows.values()]))
        return f"{m:.3f} (n={len(rows)})"

    lines = ["<!-- generated by scripts/ablation_check.py --markdown -->"]
    lines.append("")
    lines.append("| variant (from scratch, paired-color) | AP over seeds "
                 "| paired ΔAP vs same-seed baseline | paired ΔAP_medium |")
    lines.append("|---|---|---|---|")
    lines.append(f"| baseline (`DEV.SWITCH=False`) | {ap_cell('baseline_pc')}"
                 " | — | — |")
    for arm, label in (("l2_pc", "intertwiner `l2` (configs/105 recipe)"),
                       ("ot_pc", "intertwiner `ot` (Sinkhorn meta loss)")):
        dap, _ = delta_cell(arm, "baseline_pc", "AP")
        dam, _ = delta_cell(arm, "baseline_pc", "AP_medium")
        lines.append(f"| {label} | {ap_cell(arm)} | {dap} | {dam} |")
    lines.append("")
    lines.append("| warm-graft arm | AP over seeds | paired ΔAP vs "
                 "same-seed baseline-ft |")
    lines.append("|---|---|---|")
    lines.append(f"| baseline-ft (`DEV.SWITCH=False`) | "
                 f"{ap_cell('baseline_ft_pc')} | — |")
    for arm, label in (
            ("l2_ft_pc", "l2-ft, reference init"),
            ("l2_ft_pc_id",
             "l2-ft, `UPSAMPLE_INIT=identity` + `UPSAMPLE_RESIDUAL`"),
            ("ot_ft_pc_id",
             "ot-ft, `UPSAMPLE_INIT=identity` + `UPSAMPLE_RESIDUAL`")):
        dap, _ = delta_cell(arm, "baseline_ft_pc", "AP")
        lines.append(f"| {label} | {ap_cell(arm)} | {dap} |")
    return "\n".join(lines)


def _seeds_to_resolve(d, alpha_z=1.96, cap=10000):
    """Seeds needed for the mean-paired-delta 95% CI (normal approx,
    observed sd) to exclude zero — the tracked power analysis VERDICT r2 #2
    asks for when the measured n cannot resolve the effect. Returns the
    smallest n with |mean| > z·sd/√n, or ">cap" when the observed mean is
    (near) zero and no finite n resolves it."""
    m, s = abs(float(np.mean(d))), float(np.std(d, ddof=1))
    if s == 0:
        return 1
    if m < 1e-9:
        return f">{cap}"
    n = int(np.ceil((alpha_z * s / m) ** 2))
    return n if n <= cap else f">{cap}"


def _paired_bootstrap(d, n_boot=10000, seed=0):
    """95% percentile bootstrap CI of the mean paired delta, plus a
    two-sided sign-flip permutation p-value for mean Δ = 0.

    The round-2 roadmap item (README "Roadmap"): at n=4 the paired ΔAP CI
    was wider than the expected effect; with ≥10 seeds this resolves
    whether the meta-loss effect is distinguishable from seed noise."""
    rng = np.random.RandomState(seed)
    n = d.size
    boots = d[rng.randint(0, n, size=(n_boot, n))].mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    # sign-flip permutation: under H0 (no arm effect) each paired delta's
    # sign is exchangeable; exact for tiny n via full enumeration
    obs = abs(d.mean())
    if n <= 16:
        signs = np.array(
            [[1 if (m >> i) & 1 else -1 for i in range(n)]
             for m in range(2 ** n)])
    else:
        signs = rng.choice([-1, 1], size=(n_boot, n))
    p = float(np.mean(np.abs((signs * d).mean(axis=1)) >= obs - 1e-12))
    return float(lo), float(hi), p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="baseline,l2,ot")
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--schedule", default="16,4,4",
                    help="3-stage epoch schedule; LR decays at stage sums")
    ap.add_argument("--train-n", type=int, default=600)
    ap.add_argument("--val-n", type=int, default=100)
    ap.add_argument("--init-npz", default=None,
                    help="pretrained overlay (paper-regime fine-tune); "
                         "results tagged <variant>_ft")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--loss-fac", type=float, default=None,
                    help="DEV.LOSS_FAC override (default: the flagship "
                         "recipe's 10.0); combine with --tag facN so dose "
                         "arms get their own record names")
    ap.add_argument("--upsample-init", default="xavier",
                    choices=["xavier", "identity"],
                    help="make-up layer kernel init (warm-graft mitigation)")
    ap.add_argument("--upsample-residual", action="store_true",
                    help="zero-init gated residual around the make-up layer "
                         "(exact identity at graft time)")
    ap.add_argument("--color-mode", default="class",
                    choices=["class", "paired"],
                    help="'paired': classes share colors pairwise and "
                         "differ only by geometry (small-object-hard "
                         "regime); results tagged <variant>_pc")
    ap.add_argument("--tag", default="",
                    help="extra run tag appended to the variant name so a "
                         "new regime (e.g. a longer schedule) does not "
                         "overwrite existing records")
    ap.add_argument("--table-only", action="store_true")
    ap.add_argument("--markdown", action="store_true",
                    help="print the README 'Capability evidence' tables "
                         "generated verbatim from the tracked records")
    ap.add_argument("--in-process", action="store_true",
                    help="run all arms in this process (debug; leaks ~15 GB "
                         "host RSS per arm — the default forks per arm)")
    args = ap.parse_args()

    os.makedirs(ABLATION_DIR, exist_ok=True)
    results_file = os.path.join(ABLATION_DIR, "ablation_results.json")
    if args.table_only or args.markdown:
        with open(results_file) as f:
            recs = json.load(f)
        print(markdown_tables(recs) if args.markdown else "", end="")
        if args.table_only:
            print_table(recs)
        return

    schedule = [int(x) for x in args.schedule.split(",")]
    data_root = os.path.join(
        ABLATION_DIR, "data" if args.color_mode == "class" else "data_paired")
    run_tag = "" if args.color_mode == "class" else "_pc"
    if args.tag:
        run_tag += f"_{args.tag}"
    ensure_dataset(data_root, args.train_n, args.val_n,
                   color_mode=args.color_mode)

    arms = [(s, v) for s in [int(x) for x in args.seeds.split(",")]
            for v in args.variants.split(",")]
    if len(arms) == 1 or args.in_process:
        for seed, variant in arms:
            run_variant(variant, seed, schedule, data_root,
                        init_npz=args.init_npz, lr=args.lr, run_tag=run_tag,
                        upsample_init=args.upsample_init,
                        upsample_residual=args.upsample_residual,
                        loss_fac=args.loss_fac)
    else:
        # one fresh interpreter per arm: a multi-arm sweep in one process
        # accumulates ~15 GB of host RSS per arm (jit executables + live
        # arrays never fully return to the OS) and a 9-arm run gets
        # OOM-killed around arm 7 on a 128 GB host. The XLA compile cache
        # (jax_compilation_cache_dir above) keeps recompiles cheap across
        # processes. Arms run sequentially — one TPU process at a time.
        import subprocess
        for seed, variant in arms:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--variants", variant, "--seeds", str(seed),
                   "--schedule", args.schedule,
                   "--train-n", str(args.train_n), "--val-n", str(args.val_n),
                   "--color-mode", args.color_mode]
            if args.init_npz:
                cmd += ["--init-npz", args.init_npz]
            if args.lr is not None:
                cmd += ["--lr", str(args.lr)]
            if args.loss_fac is not None:
                cmd += ["--loss-fac", str(args.loss_fac)]
            if args.tag:
                cmd += ["--tag", args.tag]
            if args.upsample_init != "xavier":
                cmd += ["--upsample-init", args.upsample_init]
            if args.upsample_residual:
                cmd += ["--upsample-residual"]
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"[ablation] arm {variant} s{seed} exited {rc}; "
                      "continuing with remaining arms", flush=True)

    with open(results_file) as f:
        print_table(json.load(f))


if __name__ == "__main__":
    main()
