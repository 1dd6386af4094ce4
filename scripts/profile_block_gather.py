"""Measure XLA block-gather throughput vs the 45 GB/s row-gather wall.

Round-1 analysis (ops/roi_align.py:23-34) measured the row-gather engine at
~45 GB/s and rejected packed/tiny-block formulations. The remaining fusion
candidate (VERDICT r1 #2) exploits FPN eqn-1: a box spans only ~10-20 px on
its assigned level, so a whole sample ROW SEGMENT fits in one contiguous
[S, C] block (S=32 covers every level at 1024²; P5 rows are exactly 32).
If gathers of 16 KB contiguous blocks run near HBM bandwidth rather than at
the row-gather wall, bilinear interp can be re-expressed as (few blocks per
box) + tiny matmuls and the RoI stage beats the wall; if they also run at
~45 GB/s, the wall stands and the rejection note gets its measurement.

Measures, for the batch-32-inference-like shape (32x1000 RoIs, 256 ch bf16):
  - baseline: 4-corner row gather (the production multilevel path)
  - block gathers slice_sizes=(S, C) for S in {4, 8, 16, 32} at the same
    total usable-byte volume, reporting achieved GB/s per formulation.
  - corner-pair [2,C] blocks and 2-D window [Sy,Sx,C] gathers from the
    unflattened map (one window covers a box's whole sample grid).

RESULTS (v5e, 2026-08-17): row gather 27.5 GB/s single-stream; 1-D blocks
1.3/2.5/4.7/8.7 GB/s for S=4/8/16/32 (descriptor-bound — reject); pairs
0.6 GB/s (reject); 2-D windows ~67 GB/s — the only formulation beating the
row engine per byte, but byte volume (2.6x for 7^2 crops) and the stacked-
pyramid memory it needs net it out. Full analysis: ops/roi_align.py
module docstring ("Round-2 follow-up").
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("I", "10"))
N = int(os.environ.get("N", "32000"))       # total RoIs (batch 32 x 1000)
C = 256
DTYPE = jnp.bfloat16
TOTAL_ROWS = 32 * (256 * 256 + 128 * 128 + 64 * 64 + 32 * 32)  # B x sum HW


def timeit(name, fn, *args, bytes_moved=None):
    f = jax.jit(fn)
    np.asarray(jax.block_until_ready(f(*args))[0, 0])
    # force full materialization via a reduction for timing
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    gbs = (bytes_moved / dt / 1e9) if bytes_moved else float("nan")
    print(f"{name:44s} {dt*1e3:8.2f} ms   {gbs:7.1f} GB/s(used)",
          flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    flat2 = jnp.asarray(rng.randn(TOTAL_ROWS, C), DTYPE)
    bpr = C * 2  # bytes per row

    # --- baseline: 4-corner row gather, 49 samples (the 7x7 classifier crop)
    n_rows = N * 49 * 4
    idx = jnp.asarray(rng.randint(0, TOTAL_ROWS, (n_rows,)), jnp.int32)
    timeit(f"row gather x{n_rows//1000}k (4-corner 7x7)",
           lambda f, i: jnp.take(f, i, axis=0), flat2, idx,
           bytes_moved=n_rows * bpr)

    # --- block gathers: M blocks of [S, C] such that M*S*C*2 == usable bytes
    for S in (4, 8, 16, 32):
        m = n_rows // S
        starts = jnp.asarray(
            rng.randint(0, TOTAL_ROWS - S, (m, 1)), jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))

        def block_gather(f, s, _S=S, _d=dnums):
            return jax.lax.gather(
                f, s, _d, slice_sizes=(_S, C), mode="clip")

        timeit(f"block gather {m//1000}k x [S={S},{C}] "
               f"({S*bpr//1024}KB blocks)",
               block_gather, flat2, starts, bytes_moved=m * S * bpr)

    # --- adjacent-corner pair [2, C]: tl/tr (and bl/br) are adjacent rows in
    # the flattened layout, so 4-corner gathers can become 2 pair-gathers at
    # identical byte volume. Wins iff per-byte cost of [2,C] blocks ~= rows.
    m = n_rows // 2
    starts = jnp.asarray(rng.randint(0, TOTAL_ROWS - 2, (m, 1)), jnp.int32)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    timeit(f"pair gather {m//1000}k x [2,{C}] (corner pairs)",
           lambda f, s: jax.lax.gather(f, s, dnums, slice_sizes=(2, C),
                                       mode="clip"),
           flat2, starts, bytes_moved=m * 2 * bpr)

    # --- 2-D window blocks [Sy, Sx, C] from the unflattened level map: one
    # window covers ALL 49 samples x 4 corners of a box (typical on-level box
    # span is 10-20 px, SURVEY FPN eqn-1), replacing 196 row reads with
    # Sy strided Sx-segments. Byte volume rises (Sy*Sx vs 196 unique-ish
    # rows) so this needs the block engine to beat the row wall per byte.
    img = jnp.asarray(rng.randn(32, 256, 256, C), DTYPE)
    for sy, sx in ((8, 32), (12, 32), (16, 32), (24, 32), (16, 64)):
        # cap the materialized output at ~1.5 GB
        n_boxes = min(N, int(1.5e9) // (sy * sx * C * 2))
        bi = rng.randint(0, 32, (n_boxes, 1))
        ys = rng.randint(0, 256 - sy, (n_boxes, 1))
        xs = rng.randint(0, 256 - sx, (n_boxes, 1))
        starts3 = jnp.asarray(np.concatenate([bi, ys, xs], 1), jnp.int32)
        d3 = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))

        def win_gather(f, s, _sy=sy, _sx=sx, _d=d3):
            return jax.lax.gather(
                f, s, _d, slice_sizes=(1, _sy, _sx, C), mode="clip")

        timeit(f"2D window {n_boxes//1000}k x [{sy},{sx},{C}]",
               win_gather, img, starts3,
               bytes_moved=n_boxes * sy * sx * bpr)

    # --- dynamic_slice chunk loop alternative (scan of big contiguous DMAs)
    S = 32
    m = n_rows // S
    starts1 = jnp.asarray(rng.randint(0, TOTAL_ROWS - S, (m,)), jnp.int32)

    def scan_slices(f, s):
        def body(carry, st):
            blk = jax.lax.dynamic_slice(f, (st, 0), (S, C))
            return carry + jnp.sum(blk.astype(jnp.float32)), 0.0
        tot, _ = jax.lax.scan(body, 0.0, s)
        return tot[None, None]

    timeit(f"scan dynamic_slice {m//1000}k x [32,{C}]",
           scan_slices, flat2, starts1, bytes_moved=m * S * bpr)


if __name__ == "__main__":
    main()
