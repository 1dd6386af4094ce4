"""On-hardware comparison: Pallas VMEM-resident RoIAlign vs XLA gather.

Single-level P2-like shapes at inference scale (B=8, 1024 RoIs, 7x7;
N must divide by the Pallas box tiles or those configs are skipped).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops.roi_align import (
    crop_and_resize, crop_and_resize_pallas)

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "1024"))  # divisible by the Pallas box tiles
H = W = int(os.environ.get("S", "256"))
C = 256
REPS = int(os.environ.get("REPS", "5"))


from _bench import scan_time as _scan_time


def scan_time(name, body, *ops):
    return _scan_time(name, body, *ops, reps=REPS)


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
