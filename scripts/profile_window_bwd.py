"""Window-DMA RoIAlign BACKWARD vs the XLA gather-transpose scatter-add.

The train-side door (VERDICT r3 #4): profile_devstage.py measured the
multilevel 14x14 fwd+bwd at the scatter-add wall (~22 ms at B=8, N=1600,
1024², 256ch bf16 — README "Performance"). This script measures the same
shapes through the hybrid window path, whose backward is now the
strip-tiled Pallas kernel (ops/roi_align_window_bwd.py).

Run on the TPU: python scripts/profile_window_bwd.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops.roi_align import multilevel_crop_and_resize
from feature_intertwiner_tpu.ops.roi_align_window import (
    multilevel_crop_and_resize_window)
from feature_intertwiner_tpu.ops.roi_align_window_bwd import (
    multilevel_roi_align_window_bwd)

B, N, C = 8, 1600, 256
REPS = int(os.environ.get("REPS", "5"))
SIZES = [(256, 256), (128, 128), (64, 64), (32, 32)]

from _bench import scan_time as _scan_time


def scan_time(name, body, *ops):
    return _scan_time(name, body, *ops, reps=REPS)


def main():
    rng = np.random.RandomState(0)
    maps = [jnp.array(rng.randn(B, h, w, C).astype(np.float32),
                      dtype=jnp.bfloat16) for h, w in SIZES]
    shapes = tuple((B, h, w, C) for h, w in SIZES)
    y1x1 = rng.uniform(0, 0.7, (N, 2))
    hw = rng.uniform(0.02, 0.3, (N, 2))
    boxes = jnp.array(
        np.minimum(np.concatenate([y1x1, y1x1 + hw], -1), 1.0).astype(
            np.float32))
    idx = jnp.tile(np.arange(B, dtype=np.int32), N // B)
    idx = jnp.array(np.sort(np.asarray(idx)))

    scan_time("floor", lambda c, i: c + 1.0)

    for crop in ((7, 7), (14, 14)):
        tag = f"{crop[0]}x{crop[1]}"
        g_fixed = jnp.array(
            rng.randn(N, crop[0], crop[1], C).astype(np.float32),
            dtype=jnp.bfloat16)

        # ---- baseline: XLA gather fwd + transpose-scatter bwd ----
        def xla_fb(c, i, *ms, crop=crop):
            def f(ms_):
                out = multilevel_crop_and_resize(
                    list(ms_), boxes + c * 1e-9, idx, crop, (1024, 1024))
                return jnp.sum(out.astype(jnp.float32))
            gs = jax.grad(f)(ms)
            return c + jnp.sum(gs[0].astype(jnp.float32)) * 1e-9
        scan_time(f"XLA gather {tag} fwd+bwd (scatter-add)", xla_fb, *maps)

        # ---- hybrid window fwd + Pallas strip bwd ----
        def win_fb(c, i, *ms, crop=crop):
            def f(ms_):
                out = multilevel_crop_and_resize_window(
                    list(ms_), boxes + c * 1e-9, idx, crop, (1024, 1024))
                return jnp.sum(out.astype(jnp.float32))
            gs = jax.grad(f)(ms)
            return c + jnp.sum(gs[0].astype(jnp.float32)) * 1e-9
        scan_time(f"window hybrid {tag} fwd+bwd (Pallas strip)", win_fb,
                  *maps)

        # ---- backward alone: XLA transpose vs Pallas kernel ----
        def xla_bwd(c, i, g, *ms, crop=crop):
            def f(ms_):
                out = multilevel_crop_and_resize(
                    list(ms_), boxes + c * 1e-9, idx, crop, (1024, 1024))
                return out
            # the gather's output is f32; the cotangent must match
            gs = jax.linear_transpose(f, ms)(g.astype(jnp.float32))
            return c + jnp.sum(gs[0][0].astype(jnp.float32)) * 1e-9
        scan_time(f"XLA transpose {tag} bwd alone", xla_bwd, g_fixed, *maps)

        from feature_intertwiner_tpu.ops.roi_align import assign_fpn_level
        lvl = jnp.clip(
            assign_fpn_level(boxes, (1024, 1024)) - 2, 0, 3).astype(jnp.int32)

        def pallas_bwd(c, i, g, crop=crop, lvl=lvl):
            d = multilevel_roi_align_window_bwd(
                g.astype(jnp.float32) + c * 1e-9, boxes, idx, lvl,
                shapes, crop, (32, 32))
            return c + jnp.sum(d[0]) * 1e-9
        scan_time(f"Pallas strip {tag} bwd alone", pallas_bwd, g_fixed)


if __name__ == "__main__":
    main()
