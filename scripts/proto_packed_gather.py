"""Prototype: 4-corner packed-row RoIAlign gather (1 row/sample, 4C channels).

Validates bit-parity with multilevel_crop_and_resize and measures speedup.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops import roi_align as RA

B = int(os.environ.get("B", "32"))
N = int(os.environ.get("N", "1000"))
ITERS = int(os.environ.get("I", "5"))
C = int(os.environ.get("C", "256"))
SIZES = [(256, 256), (128, 128), (64, 64), (32, 32)]


def pack_corners(f):
    """[B,H,W,C] -> [B,H,W,4C]: (tl, tr, bl, br) with edge replication."""
    fx = jnp.concatenate([f[:, :, 1:], f[:, :, -1:]], axis=2)
    top = jnp.concatenate([f, fx], axis=-1)                     # [B,H,W,2C]
    bot = jnp.concatenate([top[:, 1:], top[:, -1:]], axis=1)
    return jnp.concatenate([top, bot], axis=-1)                 # [B,H,W,4C]


def packed_multilevel(features, boxes, box_indices, crop_size, image_shape,
                      assign_base=224.0, level_idx=None):
    if level_idx is None:
        level_idx = RA.assign_fpn_level(boxes, image_shape, base=assign_base) - 2
    packed = [pack_corners(f) for f in features]
    flat, heights, widths, offsets = RA.flatten_pyramid(packed)
    b, total, c4 = flat.shape
    c = c4 // 4
    ch, cw = crop_size
    hs = heights[level_idx].astype(jnp.float32)
    ws = widths[level_idx].astype(jnp.float32)
    off = offsets[level_idx]

    y1, x1, y2, x2 = [boxes[:, i] for i in range(4)]
    pos_y = RA._sample_positions(y1, y2, ch, hs)
    pos_x = RA._sample_positions(x1, x2, cw, ws)
    ty, by, ly, vy = RA._corner_weights(pos_y, hs)
    lx_i, rx_i, lx, vx = RA._corner_weights(pos_x, ws)

    flat2 = flat.reshape(b * total, c4)
    base = box_indices.astype(jnp.int32) * total + off
    wi = ws.astype(jnp.int32)
    idx = (base[:, None, None] + ty[:, :, None] * wi[:, None, None]
           + lx_i[:, None, :])                                   # [N, ch, cw]
    rows = jnp.take(flat2, idx.reshape(-1), axis=0)             # [N*ch*cw, 4C]
    rows = rows.reshape(-1, ch, cw, 4, c)
    tl, tr, bl, br = [rows[..., k, :] for k in range(4)]

    lxb = lx[:, None, :, None]
    lyb = ly[:, :, None, None]
    top = tl + (tr - tl) * lxb
    bot = bl + (br - bl) * lxb
    out = top + (bot - top) * lyb
    invalid = ~(vy[:, :, None] & vx[:, None, :])
    return jnp.where(invalid[..., None], 0.0, out)


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    maps = [jnp.array(rng.randn(B, h, w, C).astype(np.float32),
                      dtype=jnp.bfloat16) for h, w in SIZES]
    y1x1 = rng.uniform(-0.05, 0.8, (B * N, 2))
    hw = rng.uniform(0.01, 0.4, (B * N, 2))
    boxes = jnp.array(np.concatenate([y1x1, y1x1 + hw], -1).astype(np.float32))
    idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)

    for crop in (7, 14):
        ref = jax.jit(lambda *a: RA.multilevel_crop_and_resize(
            list(a[:4]), a[4], a[5], (crop, crop), (1024, 1024)))(
                *maps, boxes, idx)
        new = jax.jit(lambda *a: packed_multilevel(
            list(a[:4]), a[4], a[5], (crop, crop), (1024, 1024)))(
                *maps, boxes, idx)
        d = np.abs(np.asarray(ref, np.float32) - np.asarray(new, np.float32))
        print(f"crop {crop}: max abs diff = {d.max():.3e}  (bit-exact: {d.max() == 0.0})")

        timeit(f"current multilevel {crop}x{crop}",
               lambda *a: RA.multilevel_crop_and_resize(
                   list(a[:4]), a[4], a[5], (crop, crop), (1024, 1024)),
               *maps, boxes, idx)
        timeit(f"packed multilevel {crop}x{crop}",
               lambda *a: packed_multilevel(
                   list(a[:4]), a[4], a[5], (crop, crop), (1024, 1024)),
               *maps, boxes, idx)


if __name__ == "__main__":
    main()
