"""On-hardware comparison: Pallas VMEM-resident RoIAlign vs XLA gather.

Single-level P2-like shapes at inference scale (B=8, 1000 RoIs, 7x7).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops.roi_align import (
    crop_and_resize, crop_and_resize_pallas)

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "1000"))
H = W = int(os.environ.get("S", "256"))
C = 256
REPS = int(os.environ.get("REPS", "5"))


def scan_time(name, body, *ops):
    @jax.jit
    def run(*ops_):
        def step(c, i):
            return body(c, i, *ops_), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(REPS))
        return c
    try:
        np.asarray(run(*ops))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    np.asarray(run(*ops)); np.asarray(run(*ops))
    dt = (time.perf_counter() - t0) / 2
    print(f"{name:44s} {dt/REPS*1e3:8.2f} ms/rep")


def main():
    rng = np.random.RandomState(0)
    img = jnp.array(rng.randn(B, H, W, C).astype(np.float32), dtype=jnp.bfloat16)
    y1x1 = rng.uniform(0, 0.7, (B, N, 2))
    hw = rng.uniform(0.02, 0.3, (B, N, 2))
    boxes_b = jnp.array(np.concatenate([y1x1, y1x1 + hw], -1).astype(np.float32))
    boxes_flat = boxes_b.reshape(-1, 4)
    idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)

    scan_time("floor", lambda c, i: c + 1.0)

    def xla(c, i, im, bx, ix):
        out = crop_and_resize(im, bx + c * 1e-9, ix, (7, 7))
        return c + jnp.sum(out.astype(jnp.float32)) * 1e-9
    scan_time("XLA gather single-level 7x7", xla, img, boxes_flat, idx)

    for bt, ct in ((64, 128), (128, 64), (256, 128)):
        if N % bt:
            continue
        def pk(c, i, im, bx, _bt=bt, _ct=ct):
            out = crop_and_resize_pallas(im, bx + c * 1e-9, (7, 7),
                                         box_tile=_bt, channel_tile=_ct)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-9
        scan_time(f"pallas bt={bt} ct={ct}", pk, img, boxes_b)


if __name__ == "__main__":
    main()
