#!/usr/bin/env python
"""Measure per-box HBM->VMEM window-DMA bandwidth (VERDICT r2 #3).

The round-2 RoIAlign analysis (ops/roi_align.py:33-60) rejected every XLA
gather formulation except the production 4-corner row gather (measured at
the ~45 GB/s gather-engine wall) and left ONE unexplored door: a Pallas
kernel that manually DMAs per-box [Sy,Sx,C] windows HBM->VMEM with dynamic
offsets, double-buffered (the paged-attention pattern), and interpolates
on-chip. Whether that door is worth opening reduces to one number: the
bandwidth per-box window DMA actually sustains at RoIAlign's window sizes
(196 KB-1 MB, thousands of windows at random offsets).

This probe isolates exactly that: a double-buffered DMA loop over N random
window origins + a checksum reduce that touches every byte (so the copy
cannot be elided), swept over window sizes, vs the XLA row-gather moving
the same bytes. No interpolation math — if raw window DMA cannot beat the
row-gather wall by enough to cover the interpolation overhead and the
2.6x byte inflation of whole-box windows (7² stage), the full kernel
cannot either, and the rejection is measured at the standard the round-2
analysis set.

Run on the chip: python scripts/profile_window_dma.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(origins_ref, img_ref, out_ref, scratch, sems, *, bt, sy, sx):
    """One grid step = one tile of BT boxes.

    origins_ref: scalar-prefetch SMEM [N] int32, packed b·2^20 + y0·2^8 +
                 x0//8 — 2-D [N,k] prefetch operands are lane-padded to
                 [N,128] in SMEM (a [4096,3] i32 array allocates 2 MB
                 against the 1 MB SMEM budget and refuses to compile);
                 1-D arrays pad only the lane dim.
    img_ref:     ANY/HBM [B, H, W, C]
    out_ref:     VMEM [BT, C] per-box column checksums
    scratch:     VMEM [2, sy, sx, C] double buffer
    sems:        DMA semaphores [2]
    """
    ti = pl.program_id(0)

    def get_dma(slot, i):
        v = origins_ref[ti * bt + i]
        b = v // (2 ** 20)
        y0 = (v // (2 ** 8)) % (2 ** 12)
        # x0 stored as //8, multiplied back here: Mosaic must SYNTACTICALLY
        # prove the W start divisible by the 8-wide sublane tile — a runtime
        # value that merely happens to be aligned does not compile ("Failed
        # to prove that a tile index in dimension 2 is divisible by 8")
        x0 = (v % (2 ** 8)) * 8
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(y0, sy), pl.ds(x0, sx), :],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(i, _):
        slot = lax.rem(i, 2)
        nxt = lax.rem(i + 1, 2)

        @pl.when(i + 1 < bt)
        def _():
            get_dma(nxt, i + 1).start()

        get_dma(slot, i).wait()
        win = scratch[slot].astype(jnp.float32)        # [sy, sx, C]
        out_ref[i, :] = jnp.sum(win, axis=(0, 1)).astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, bt, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sy", "sx", "bt", "interpret"))
def window_dma_checksum(img, origins, sy, sx, bt=128, interpret=False):
    """img [B,H,W,C]; origins [N,3] int32 (b,y0,x0//8) -> [N,C] window
    sums. Origins are packed to one int32 per box (SMEM budget — see
    kernel docstring)."""
    n = origins.shape[0]
    c = img.shape[-1]
    assert n % bt == 0
    origins = (origins[:, 0] * 2 ** 20 + origins[:, 1] * 2 ** 8
               + origins[:, 2]).astype(jnp.int32)
    kernel = functools.partial(_probe_kernel, bt=bt, sy=sy, sx=sx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bt, c), lambda ti, _: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sy, sx, c), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(origins, img)


@functools.partial(jax.jit, static_argnames=("rows",))
def row_gather_checksum(img, origins, rows):
    """The production formulation's traffic shape: per-box gathers of
    `rows` individual [C] rows at random (y, x) offsets — the 4-corner
    row-gather engine's access pattern (ops/roi_align.py:23-31)."""
    b, h, w, c = img.shape
    flat = img.reshape(b * h * w, c)
    base = origins[:, 0] * (h * w) + origins[:, 1] * w + origins[:, 2]
    offs = (jnp.arange(rows, dtype=jnp.int32) * 37) % (w * 7)  # scattered
    idx = base[:, None] + offs[None, :]
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(-1, rows, c)
    return jnp.sum(vals.astype(jnp.float32), axis=1)


def _time(fn, *arrays, reps=5):
    # Timing idiom for the remote (axon) platform (cf.
    # scripts/profile_gather.py::timeit): scalar-reduce inside jit +
    # np.asarray (block_until_ready on a large output is not a reliable
    # sync point and a full-output transfer would dominate). Array operands
    # MUST be jit arguments — closing over them embeds them as constants in
    # the compile request shipped to the remote compiler (HTTP 413).
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(f(*arrays))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*arrays))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    b, h, w, c = 8, 256, 256, 256   # P2 at 1024² — the dominant map
    img = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    n = 4096                         # ~8×512 RoIs
    print(f"map [B={b},H={h},W={w},C={c}] bf16, {n} windows, v5e")
    print(f"{'window':>12} {'bytes/box':>10} {'total GB':>9} "
          f"{'ms':>8} {'GB/s':>7} {'us/box':>7}")
    # windows with sublane-aligned Sx only (a 34-wide scratch block fails
    # Mosaic's (8,128) tiling)
    for sy, sx in [(8, 8), (8, 16), (16, 16), (16, 32), (32, 32),
                   (32, 64), (64, 64)]:
        origins = np.stack([
            rng.randint(0, b, n), rng.randint(0, h - sy, n),
            # W starts 8-aligned (Mosaic HBM sublane tiling), stored as //8
            rng.randint(0, (w - sx) // 8 + 1, n)], axis=1).astype(np.int32)
        o = jnp.asarray(origins)
        try:
            t = _time(lambda im, oo: window_dma_checksum(im, oo, sy, sx),
                      img, o)
        except Exception as e:  # noqa: BLE001 — report lowering failures
            print(f"{sy}x{sx:>9} FAILED: {type(e).__name__}: {str(e)[:80]}")
            continue
        bytes_box = sy * sx * c * 2
        total = n * bytes_box
        print(f"{sy}x{sx:>9} {bytes_box:>10,} {total/1e9:>9.2f} "
              f"{t*1e3:>8.2f} {total/t/1e9:>7.1f} {t/n*1e6:>7.2f}")

    # the row-gather reference point at the two crop sizes' byte footprints
    for rows, label in [(196, "7² corners"), (784, "14² corners")]:
        origins = np.stack([
            rng.randint(0, b, n), rng.randint(0, h - 8, n),
            rng.randint(0, w - 8, n)], axis=1).astype(np.int32)
        o = jnp.asarray(origins)
        t = _time(lambda im, oo: row_gather_checksum(im, oo, rows), img, o)
        total = n * rows * c * 2
        print(f"{label:>12} {rows*c*2:>10,} {total/1e9:>9.2f} "
              f"{t*1e3:>8.2f} {total/t/1e9:>7.1f} {t/n*1e6:>7.2f}")


if __name__ == "__main__":
    main()
