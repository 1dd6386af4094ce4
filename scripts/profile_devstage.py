"""Dev-stage cost decomposition: gathers, their backward scatters, critic.

Quantifies where the intertwiner's step-time cost lives (B=8, 1600 RoIs,
P2..P5 @1024, 256ch bf16).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops.roi_align import (
    crop_and_resize, multilevel_crop_and_resize)

B, N, C = 8, 1600, 256
REPS = int(os.environ.get("REPS", "5"))
SIZES = [(256, 256), (128, 128), (64, 64), (32, 32)]


from _bench import scan_time as _scan_time


def scan_time(name, body, *ops):
    return _scan_time(name, body, *ops, reps=REPS)


def main():
    rng = np.random.RandomState(0)
    maps = [jnp.array(rng.randn(B, h, w, C).astype(np.float32), dtype=jnp.bfloat16)
            for h, w in SIZES]
    y1x1 = rng.uniform(0, 0.7, (N, 2))
    hw = rng.uniform(0.02, 0.3, (N, 2))
    boxes = jnp.array(np.concatenate([y1x1, y1x1 + hw], -1).astype(np.float32))
    idx = jnp.tile(np.arange(B, dtype=np.int32), N // B)
    idx = jnp.array(np.sort(np.asarray(idx)))

    scan_time("floor", lambda c, i: c + 1.0)

    # forward gathers
    def fwd14(c, i, *ms):
        out = multilevel_crop_and_resize(
            list(ms), boxes + c * 1e-9, idx, (14, 14), (1024, 1024))
        return c + jnp.sum(out.astype(jnp.float32)) * 1e-9
    scan_time("multilevel gather 14x14 fwd", fwd14, *maps)

    def fwd7(c, i, *ms):
        out = multilevel_crop_and_resize(
            list(ms), boxes + c * 1e-9, idx, (7, 7), (1024, 1024))
        return c + jnp.sum(out.astype(jnp.float32)) * 1e-9
    scan_time("multilevel gather 7x7 fwd", fwd7, *maps)

    # backward scatter (grad wrt maps)
    def g14(c, i, *ms):
        def f(ms_):
            out = multilevel_crop_and_resize(
                list(ms_), boxes + c * 1e-9, idx, (14, 14), (1024, 1024))
            return jnp.sum(out.astype(jnp.float32))
        gs = jax.grad(f)(ms)
        return c + jnp.sum(gs[0].astype(jnp.float32)) * 1e-9
    scan_time("multilevel 14x14 fwd+bwd (scatter-add)", g14, *maps)

    # big path: 3 single-level 14x14 crops of all rois
    def big3(c, i, *ms):
        acc = c
        for l in range(3):
            out = crop_and_resize(ms[l], boxes + c * 1e-9, idx, (14, 14))
            acc = acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
        return acc
    scan_time("big path: 3x single-level 14x14 fwd", big3, *maps)

    # critic-shaped convs on 1600 rois (fwd)
    k1 = jnp.array(rng.randn(3, 3, C, 512).astype(np.float32), dtype=jnp.bfloat16)
    k2 = jnp.array(rng.randn(7, 7, 512, 1024).astype(np.float32), dtype=jnp.bfloat16)
    k3 = jnp.array(rng.randn(1, 1, 1024, 1024).astype(np.float32), dtype=jnp.bfloat16)
    x14 = jnp.array(rng.randn(N, 14, 14, C).astype(np.float32), dtype=jnp.bfloat16)

    def critic(c, i, x0, w1, w2, w3):
        x = x0 + c.astype(jnp.bfloat16) * 1e-9
        x = jax.lax.conv_general_dilated(x, w1, (2, 2), "SAME",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, w2, (1, 1), "VALID",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, w3, (1, 1), "VALID",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.sum(x.astype(jnp.float32)) * 1e-9
    scan_time("critic convs fwd (1600 rois)", critic, x14, k1, k2, k3)

    # upsampler conv 3x3 256->256 on all four maps (fwd)
    ku = jnp.array(rng.randn(3, 3, C, C).astype(np.float32), dtype=jnp.bfloat16)

    def ups(c, i, w, *ms):
        acc = c
        for m in ms:
            y = jax.lax.conv_general_dilated(
                m + c.astype(jnp.bfloat16) * 1e-9, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-9
        return acc
    scan_time("upsampler 3x3 conv on P2..P5 fwd", ups, ku, *maps)


if __name__ == "__main__":
    main()
