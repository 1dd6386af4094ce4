"""Micro-profile of the second stage: multilevel RoIAlign vs head matmuls.

Decomposes the +112ms "dev+classifier" step from profile_inference.py.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.ops import roi_align as RA

B = int(os.environ.get("B", "32"))
N = int(os.environ.get("N", "1000"))
ITERS = int(os.environ.get("I", "10"))
C = 256
SIZES = [(256, 256), (128, 128), (64, 64), (32, 32)]  # P2..P5 @1024


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    maps = [jnp.array(rng.randn(B, h, w, C).astype(np.float32),
                      dtype=jnp.bfloat16) for h, w in SIZES]
    y1x1 = rng.uniform(0, 0.7, (B * N, 2))
    hw = rng.uniform(0.02, 0.3, (B * N, 2))
    boxes = jnp.array(np.concatenate([y1x1, y1x1 + hw], -1).astype(np.float32))
    idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)

    for crop in (7, 14):
        timeit(f"multilevel RoIAlign {crop}x{crop} (x{N})",
               lambda m2, m3, m4, m5, bx, ix: RA.multilevel_crop_and_resize(
                   [m2, m3, m4, m5], bx, ix, (crop, crop), (1024, 1024)),
               *maps, boxes, idx)

    # classifier-equivalent matmul: [B*N, 7*7*256] x [7*7*256, 1024]
    x = jnp.array(rng.randn(B * N, 7 * 7 * C).astype(np.float32),
                  dtype=jnp.bfloat16)
    wmat = jnp.array(rng.randn(7 * 7 * C, 1024).astype(np.float32),
                     dtype=jnp.bfloat16)
    timeit("classifier conv-as-matmul", lambda a, b_: a @ b_, x, wmat)

    # gather-only (no interp math): 4-corner take cost
    flat, heights, widths, offsets = RA.flatten_pyramid(maps)
    flat2 = flat.reshape(-1, C)
    gidx = jnp.array(rng.randint(0, flat2.shape[0], (B * N * 49 * 4,)),
                     dtype=jnp.int32)
    timeit("raw 4-corner take (6.3M rows)",
           lambda f, g: jnp.take(f, g, axis=0), flat2, gidx)

    # single-level Pallas mm kernel on P4-sized map for comparison
    bx_b = boxes.reshape(B, N, 4)[:, :N // 128 * 128]
    timeit("pallas_mm single-level 64x64 7x7",
           lambda m, bx: RA.crop_and_resize_pallas_mm(m, bx, (7, 7)),
           maps[2], bx_b)


if __name__ == "__main__":
    main()
