"""Characterize XLA TPU gather cost: rows vs traffic vs slice shape.

Decides the RoIAlign gather formulation (ops/roi_align.py).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("I", "5"))


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    H = 2785280  # 32 * (256^2+128^2+64^2+32^2)
    C = 256
    table = jnp.array(rng.randn(H, C).astype(np.float32), dtype=jnp.bfloat16)
    n_base = 32 * 1000 * 49  # 1.568M samples

    for n, c in [(4 * n_base, 256), (n_base, 256), (4 * n_base, 128),
                 (n_base, 64)]:
        idx = jnp.array(rng.randint(0, H, (n,)), dtype=jnp.int32)
        t = table[:, :c]
        timeit(f"take rows={n/1e6:.2f}M ch={c}",
               lambda tt, ii: jnp.take(tt, ii, axis=0), t, idx)

    # 2x2xC corner blocks via lax.gather: one slice per sample instead of 4
    img = jnp.array(rng.randn(32, 256, 256, C).astype(np.float32),
                    dtype=jnp.bfloat16)
    starts = np.stack([
        rng.randint(0, 32, n_base),
        rng.randint(0, 255, n_base),
        rng.randint(0, 255, n_base)], -1).astype(np.int32)
    starts_j = jnp.array(starts)

    def gather_blocks(im, st):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        return jax.lax.gather(
            im, st, dn, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP)

    timeit(f"gather 2x2x{C} blocks n={n_base/1e6:.2f}M", gather_blocks,
           img, starts_j)

    # take_along_axis batched per image (indices within image)
    img_flat = img.reshape(32, 256 * 256, C)
    idx_b = jnp.array(rng.randint(0, 65536, (32, 49000)), dtype=jnp.int32)
    timeit("take_along_axis per-image 1.57M rows",
           lambda im, ii: jnp.take_along_axis(
               im, ii[..., None], axis=1), img_flat, idx_b)

    # one_hot matmul for the smallest map only (P5: 32x32): is einsum viable
    p5 = jnp.array(rng.randn(32, 1024, C).astype(np.float32),
                   dtype=jnp.bfloat16)
    idx5 = jnp.array(rng.randint(0, 1024, (32, 49000)), dtype=jnp.int32)

    def onehot_gather(m, ii):
        oh = jax.nn.one_hot(ii, 1024, dtype=jnp.bfloat16)  # [32,49000,1024]
        return jnp.einsum("bnh,bhc->bnc", oh, m)

    timeit("one-hot matmul P5 1.57M rows", onehot_gather, p5, idx5)


if __name__ == "__main__":
    main()
