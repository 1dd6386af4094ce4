#!/usr/bin/env python
"""Post-backward-kernel full-train-step breakdown (VERDICT r4 #4).

The round-4 numbers (25.7% MFU R50 / 28.7% R101 at batch 8) predate the
strip-tiled Pallas RoIAlign backward; this script re-brackets the step on
today's path and probes the named candidate levers:

  full        shipping config (window kernel on, backbone remat on)
  fwd only    loss value, no grad — forward share
  fwd+bwd     no optimizer/buffer — optimizer share by subtraction
  window off  exact-XLA gather pooling fwd+bwd — window kernel share
  dev off     DEV.SWITCH=False — intertwiner share
  remat off   backbone activations stored, not recomputed (OOM-probed) —
              the remat recompute share

Each variant also reports XLA cost-model TFLOP and HBM GB per step.

Run on the chip:  python scripts/profile_train_breakdown.py
Knobs: B (default 8), S (1024), I (iters, 6), BACKBONE (resnet50).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.train.step import (create_train_state,
                                                make_train_step)

B = int(os.environ.get("B", "8"))
SIZE = int(os.environ.get("S", "1024"))
ITERS = int(os.environ.get("I", "6"))
BACKBONE = os.environ.get("BACKBONE", "resnet50")
PEAK_FLOPS, PEAK_BW = 197e12, 819e9  # v5e


def make_batch(batch, size, g=100):
    rng = np.random.RandomState(7)
    images = jnp.array(rng.randn(batch, size, size, 3).astype(np.float32))
    y1x1 = rng.uniform(0, size * 0.6, (batch, g, 2))
    wh = rng.uniform(20, size * 0.4, (batch, g, 2))
    boxes = jnp.array(np.concatenate(
        [y1x1, np.minimum(y1x1 + wh, size - 1)], -1).astype(np.float32))
    cls = jnp.array(rng.randint(1, 81, (batch, g)).astype(np.int32))
    masks = jnp.array((rng.rand(batch, g, 56, 56) > 0.5).astype(np.float32))
    return dict(images=images, gt_class_ids=cls, gt_boxes=boxes,
                gt_masks=masks)


def setup(dev_switch=True, window=True, remat=True):
    cfg = build_config()
    cfg.MODEL.BACKBONE = BACKBONE
    cfg.TRAIN.BATCH_SIZE = B
    cfg.DEV.SWITCH = dev_switch
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.BUFFER_SIZE = 1
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.TPU.ROI_WINDOW_KERNEL = window
    cfg.TPU.REMAT_BACKBONE = remat
    cfg.finalize()
    model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
    data = make_batch(B, SIZE)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data["images"][:1], mode="train",
        gt_class_ids=data["gt_class_ids"][:1],
        gt_boxes=data["gt_boxes"][:1], gt_masks=data["gt_masks"][:1]))()
    return cfg, model, variables, data


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def timeit(name, compiled, *args, cost_obj=None):
    o = compiled(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        o = compiled(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    fl, by = cost(cost_obj if cost_obj is not None else compiled)
    print(f"{name:34s} {dt * 1e3:8.1f} ms/step  {B / dt:6.2f} img/s  "
          f"MFU {100 * fl / dt / PEAK_FLOPS:5.1f}%  "
          f"HBM {by / 1e9:6.1f} GB ({100 * by / dt / PEAK_BW:5.1f}% util)")
    return dt


def full_variant(name, **kw):
    try:
        cfg, model, variables, data = setup(**kw)
        state = create_train_state(cfg, variables)
        step = jax.jit(make_train_step(model, cfg, "all"))
        rng = jax.random.PRNGKey(3)
        compiled = step.lower(state, data, jnp.float32(1e-3),
                              jnp.float32(1.0), rng).compile()

        def run(s):
            ns, m = compiled(s, data, jnp.float32(1e-3), jnp.float32(1.0),
                             rng)
            return m["total_loss"]
        return timeit(name, run, state, cost_obj=compiled)
    except Exception as e:  # noqa: BLE001 — OOM probes must report, not die
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    print(f"backbone={BACKBONE} B={B} size={SIZE} iters={ITERS}")
    # shipping config + its brackets
    cfg, model, variables, data = setup()
    state = create_train_state(cfg, variables)
    rng = jax.random.PRNGKey(3)

    step = jax.jit(make_train_step(model, cfg, "all"))
    compiled = step.lower(state, data, jnp.float32(1e-3), jnp.float32(1.0),
                          rng).compile()

    def full(s):
        ns, m = compiled(s, data, jnp.float32(1e-3), jnp.float32(1.0), rng)
        return m["total_loss"]
    t_full = timeit("full step (shipping)", full, state, cost_obj=compiled)

    def losses(params):
        v = {"params": params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        out = model.apply(v, data["images"], mode="train",
                          gt_class_ids=data["gt_class_ids"],
                          gt_boxes=data["gt_boxes"],
                          gt_masks=data["gt_masks"],
                          rngs={"sampling": rng})
        return sum(out[k] for k in ("rpn_class_loss", "rpn_bbox_loss",
                                    "mrcnn_class_loss", "mrcnn_bbox_loss",
                                    "mrcnn_mask_loss"))

    fwd_c = jax.jit(losses).lower(state.params).compile()
    t_fwd = timeit("forward only", fwd_c, state.params)

    # Reduce over EVERY gradient leaf: returning a single leaf (e.g. the
    # fpn p5_lateral kernel) lets XLA dead-code-eliminate the backbone
    # backward entirely — the probe then reads ~40 ms instead of the real
    # backward and misattributes it to the optimizer by subtraction.
    grad_c = jax.jit(
        lambda p: sum(jnp.sum(jnp.square(g))
                      for g in jax.tree_util.tree_leaves(jax.grad(losses)(p)))
    ).lower(state.params).compile()
    t_fb = timeit("fwd+bwd (no optim/buffer)", grad_c, state.params)

    print(f"{'-> backward share':34s} {(t_fb - t_fwd) * 1e3:8.1f} ms")
    print(f"{'-> optimizer+buffer share':34s} {(t_full - t_fb) * 1e3:8.1f} ms")

    # levers
    t_gather = full_variant("full step, window kernel OFF", window=False)
    if t_gather:
        print(f"{'-> window kernel saves':34s} "
              f"{(t_gather - t_full) * 1e3:8.1f} ms")
    t_nodev = full_variant("full step, DEV.SWITCH off", dev_switch=False)
    if t_nodev:
        print(f"{'-> intertwiner costs':34s} "
              f"{(t_full - t_nodev) * 1e3:8.1f} ms")
    t_norem = full_variant("full step, backbone remat OFF", remat=False)
    if t_norem:
        print(f"{'-> remat recompute costs':34s} "
              f"{(t_full - t_norem) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
