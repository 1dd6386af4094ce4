"""Window-DMA Pallas RoIAlign **backward** — the train-side door (VERDICT r3 #4).

The hybrid window kernel (ops/roi_align_window.py) accelerates the forward
only; its backward routes through the XLA gather transpose — the measured
~22 ms/step scatter-add at the ~45 GB/s gather wall that pins train MFU at
half of inference (README "Performance"). The CUDA reference has a real
backward kernel (atomicAdd scatter,
/root/reference/lib/roi_align/src/cuda/crop_and_resize_kernel.cu:84-165);
this is its TPU-native equivalent — deterministic by construction instead
of atomics (SURVEY.md §5 race-detection row).

Design — strip-tiled accumulation with halo spill, no read-modify-write:

- each pyramid level's gradient image is partitioned into row strips of
  ``strip_h``; one grid step owns one (level, strip, batch-image) tile;
- boxes are sorted by tile (their DMA-window origin row picks the strip —
  a window spans at most ``sy`` rows past the strip, the halo);
- the tile accumulates every one of its boxes into a VMEM strip+halo
  buffer: per box ONE MXU matmul ``d_win = Mᵀ @ g`` where the combined
  bilinear matrix is built SEPARABLY (``Mᵀ = (My ⊗ Mx)``, two tiny hat
  matrices and one broadcast multiply — ~6x cheaper than the forward's
  monolithic iota build) and added at the box's window offset;
- the strip rows are DMA'd once to the output (every output row is owned
  by exactly one tile → no output row is ever read or written twice); the
  halo rows go to a per-tile **spill** output that a vectorized XLA
  overlap-add folds back in (sy/strip_h ≈ 25% extra traffic);
- tiles are ordered strip-major/batch-minor so no two consecutive tiles
  touch the same VMEM scratch rows of one image.

Bytes moved ≈ level sizes (write once) + spills + the sorted cotangents —
bandwidth-bound at HBM speed instead of the row-gather wall.

Exactness: the per-box M here is the exact transpose of the forward
kernel's hat-function M (including the out-of-range zeroing), so for every
box the forward computed with window values this backward is the exact
linear transpose. Boxes the forward routed through the exact-XLA fallback
are excluded by the caller (their cotangent rows zeroed) and handled by an
XLA transpose over just those k boxes.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_window import _grid_params, window_origins_and_fits


def _pad_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


class _Tiling:
    """Static strip tiling of the pyramid (everything here is Python-time).

    ``W`` is the PHYSICAL (x-span-padded) width the kernel scatters into —
    levels narrower than the window x-span are padded like the forward
    (roi_align_window.py); the wrapper slices the pad columns off the
    returned gradients (their grad is zero: out-of-map taps are masked)."""

    def __init__(self, feat_shapes, sy: int, strip_h: int, sx: int = 0):
        self.strip_h = strip_h
        self.levels = []          # (H, W, n_strips, bh, main_rows, base, b)
        base = 0
        b = feat_shapes[0][0]
        self.batch = b
        for (bb, h, w, c) in feat_shapes:
            assert bb == b
            if h <= strip_h:
                n_strips, bh, main = 1, h, h
            else:
                assert h % strip_h == 0, (h, strip_h)
                n_strips, bh, main = h // strip_h, strip_h + sy, strip_h
            # physical W mirrors the forward's phys_widths_for: 8-aligned
            # and at least the window x-span (the x0 origins index it)
            self.levels.append(dict(H=h, W=max((w + 7) // 8 * 8, sx),
                                    W_logical=w, C=c,
                                    n_strips=n_strips, bh=bh, main=main,
                                    base=base))
            base += n_strips * b
        self.n_tiles = base

    def tables(self):
        lvl, bt, r0, spill_i = [], [], [], []
        for li, L in enumerate(self.levels):
            for s in range(L["n_strips"]):
                for b in range(self.batch):
                    lvl.append(li)
                    bt.append(b)
                    r0.append(s * self.strip_h if L["n_strips"] > 1 else 0)
                    spill_i.append(s * self.batch + b)
        return (np.asarray(lvl, np.int32), np.asarray(bt, np.int32),
                np.asarray(r0, np.int32), np.asarray(spill_i, np.int32))

    def scratch_bytes(self):
        return sum(L["bh"] * L["W"] * L["C"] * 4 for L in self.levels)


def _bwd_kernel(tl_ref, tb_ref, tr0_ref, tsp_ref, ts_ref, tc_ref,
                y0_ref, x08_ref,
                oy_ref, sty_ref, y0f_ref, hf_ref,
                ox_ref, stx_ref, x0f_ref, wf_ref,
                g_ref, *rest,
                tiling: _Tiling, sy: int, sx: int, ch: int, cw: int,
                ru: int):
    nlev = len(tiling.levels)
    spill_levels = [li for li, L in enumerate(tiling.levels)
                    if L["n_strips"] > 1]
    outs = rest[:nlev]
    spills = {li: rest[nlev + k] for k, li in enumerate(spill_levels)}
    scr = rest[nlev + len(spill_levels):nlev + len(spill_levels) + nlev]
    gbuf = rest[nlev + len(spill_levels) + nlev]
    gsem = rest[nlev + len(spill_levels) + nlev + 1]
    wsem = rest[nlev + len(spill_levels) + nlev + 2]

    t = pl.program_id(0)
    lvl = tl_ref[t]
    b = tb_ref[t]
    r0 = tr0_ref[t]
    sp = tsp_ref[t]
    start = ts_ref[t]
    cnt = tc_ref[t]
    c = gbuf.shape[-1]

    # zero the active level's strip buffer
    for li in range(nlev):
        @pl.when(lvl == li)
        def _(li=li):
            scr[li][...] = jnp.zeros(scr[li].shape, jnp.float32)

    def g_dma(slot, i):
        return pltpu.make_async_copy(
            g_ref.at[start + i], gbuf.at[slot], gsem.at[slot])

    @pl.when(cnt > 0)
    def _():
        g_dma(0, 0).start()

    # iota planes for the two separable hat matrices, shared across boxes
    # (int32 iota + cast: Mosaic's tpu.iota is integer-only)
    yy = lax.broadcasted_iota(jnp.int32, (sy, ru), 0).astype(jnp.float32)
    ry = lax.broadcasted_iota(jnp.int32, (sy, ru), 1)       # output index
    xx = lax.broadcasted_iota(jnp.int32, (sx, ru), 0).astype(jnp.float32)
    rx = lax.broadcasted_iota(jnp.int32, (sx, ru), 1)
    jj = (ry // cw).astype(jnp.float32)                     # output row
    kk = (rx % cw).astype(jnp.float32)                      # output col

    def body(i, _):
        slot = lax.rem(i, 2)

        @pl.when(i + 1 < cnt)
        def _():
            g_dma(lax.rem(i + 1, 2), i + 1).start()

        g_dma(slot, i).wait()
        gi = start + i

        # Mᵀ = My ⊗ Mx — exact transpose of the forward kernel's M
        # (roi_align_window.py::_window_roi_kernel): hat weights
        # w(p,t)=max(0,1-|p-t|) with out-of-range samples zeroed. The
        # validity test is the forward's LITERAL expression
        # (py + y0f >= 0) & (py + y0f <= hf - 1) — not a precomputed-bound
        # comparison, whose different f32 rounding path could flip a
        # boundary tap on edge-touching boxes (ADVICE r4).
        py = oy_ref[gi] + jj * sty_ref[gi]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - yy))
        vy = ((py + y0f_ref[gi] >= 0.0)
              & (py + y0f_ref[gi] <= hf_ref[gi] - 1.0))
        my = jnp.where(vy, wy, 0.0)                         # [sy, RU]
        px = ox_ref[gi] + kk * stx_ref[gi]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xx))
        vx = ((px + x0f_ref[gi] >= 0.0)
              & (px + x0f_ref[gi] <= wf_ref[gi] - 1.0))
        mx = jnp.where(vx, wx, 0.0)                         # [sx, RU]
        mt = (my[:, None, :] * mx[None, :, :]).reshape(sy * sx, ru)

        g32 = gbuf[slot].astype(jnp.float32)                # [RU, C]
        dwin = jnp.dot(mt, g32, preferred_element_type=jnp.float32)
        dwin = dwin.reshape(sy, sx, c)

        row = y0_ref[gi] - r0
        col = x08_ref[gi] * 8  # syntactically sublane-aligned for Mosaic
        for li in range(nlev):
            @pl.when(lvl == li)
            def _(li=li):
                cur = scr[li][pl.ds(row, sy), pl.ds(col, sx), :]
                scr[li][pl.ds(row, sy), pl.ds(col, sx), :] = cur + dwin
        return 0

    lax.fori_loop(0, cnt, body, 0)

    # write the owned strip rows (disjoint across tiles) + the halo spill;
    # fully waited before the next tile zeroes this scratch
    for li, L in enumerate(tiling.levels):
        @pl.when(lvl == li)
        def _(li=li, L=L):
            main = pltpu.make_async_copy(
                scr[li].at[pl.ds(0, L["main"])],
                outs[li].at[b, pl.ds(r0, L["main"])],
                wsem.at[0])
            main.start()
            if L["n_strips"] > 1:
                halo = pltpu.make_async_copy(
                    scr[li].at[pl.ds(L["main"], sy)],
                    spills[li].at[sp],
                    wsem.at[1])
                halo.start()
                halo.wait()
            main.wait()


@functools.partial(
    jax.jit,
    static_argnames=("feat_shapes", "crop_size", "window", "strip_h",
                     "interpret"))
def multilevel_roi_align_window_bwd(
    g: jax.Array,
    boxes: jax.Array,
    box_indices: jax.Array,
    level_idx: jax.Array,
    feat_shapes: Tuple[Tuple[int, int, int, int], ...],
    crop_size: Tuple[int, int],
    window: Tuple[int, int] = (32, 40),
    strip_h: int = 128,
    interpret: bool = False,
) -> List[jax.Array]:
    """d_features of the window-kernel forward for cotangent ``g``.

    g [N, ch, cw, C]; boxes [N,4] normalized; box_indices/level_idx [N];
    feat_shapes: the 4 pyramid NHWC shapes. Returns float32 gradient
    arrays (callers cast to the feature dtype). Rows of ``g`` belonging to
    XLA-fallback boxes must be pre-zeroed by the caller.
    """
    ch, cw = crop_size
    sy, sx = window
    n = boxes.shape[0]
    c = feat_shapes[0][-1]
    assert strip_h >= sy
    tiling = _Tiling(feat_shapes, sy, strip_h, sx=sx)

    heights = jnp.array([s[1] for s in feat_shapes], jnp.int32)
    widths = jnp.array([s[2] for s in feat_shapes], jnp.int32)
    level_idx = level_idx.astype(jnp.int32)
    y0, x0, _ = window_origins_and_fits(
        boxes, level_idx, heights, widths, crop_size, window)

    ys, yt, hf = _grid_params(boxes, level_idx, heights, widths, ch, axis=0)
    xs, xt, wf = _grid_params(boxes, level_idx, heights, widths, cw, axis=1)
    y0f = y0.astype(jnp.float32)
    x0f = x0.astype(jnp.float32)
    oy, ox = ys - y0f, xs - x0f                      # window-relative starts

    # tile assignment + stable sort (deterministic accumulation order)
    bases = jnp.array([L["base"] for L in tiling.levels], jnp.int32)
    strips = jnp.where(
        jnp.array([L["n_strips"] for L in tiling.levels], jnp.int32)[
            level_idx] > 1,
        y0 // strip_h, 0)
    tid = bases[level_idx] + strips * tiling.batch + box_indices.astype(
        jnp.int32)
    order = jnp.argsort(tid)
    tid_sorted = tid[order]

    t_arange = jnp.arange(tiling.n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tid_sorted, t_arange).astype(jnp.int32)
    tile_end = jnp.searchsorted(tid_sorted, t_arange, side="right")
    tile_cnt = (tile_end - tile_start).astype(jnp.int32)

    ru = _pad_up(ch * cw, 8)
    g_sorted = jnp.pad(
        g.reshape(n, ch * cw, c), ((0, 0), (0, ru - ch * cw), (0, 0)))[order]

    tl, tb, tr0, tsp = (jnp.asarray(a) for a in tiling.tables())

    spill_levels = [li for li, L in enumerate(tiling.levels)
                    if L["n_strips"] > 1]
    out_shapes = [jax.ShapeDtypeStruct((s[0], L["H"], L["W"], c), jnp.float32)
                  for s, L in zip(feat_shapes, tiling.levels)]
    spill_shapes = [
        jax.ShapeDtypeStruct(
            (tiling.levels[li]["n_strips"] * tiling.batch, sy,
             tiling.levels[li]["W"], c), jnp.float32)
        for li in spill_levels]

    kernel = functools.partial(
        _bwd_kernel, tiling=tiling, sy=sy, sx=sx, ch=ch, cw=cw, ru=ru)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=16,
        grid=(tiling.n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY)
            for _ in range(len(out_shapes) + len(spill_shapes))),
        scratch_shapes=[
            pltpu.VMEM((L["bh"], L["W"], c), jnp.float32)
            for L in tiling.levels
        ] + [
            pltpu.VMEM((2, ru, c), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes) + tuple(spill_shapes),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(tl, tb, tr0, tsp, tile_start, tile_cnt,
      y0[order], (x0 // 8)[order],
      oy[order], yt[order], y0f[order], hf[order],
      ox[order], xt[order], x0f[order], wf[order],
      g_sorted)

    d_feats = list(results[:len(out_shapes)])
    # fold the halo spills back in: one static-offset add per interior strip
    for k, li in enumerate(spill_levels):
        L = tiling.levels[li]
        spill = results[len(out_shapes) + k].reshape(
            L["n_strips"], tiling.batch, sy, L["W"], c)
        d = d_feats[li]
        for s in range(L["n_strips"] - 1):
            off = (s + 1) * strip_h
            d = d.at[:, off:off + sy].add(spill[s])
        d_feats[li] = d
    # drop the x-span pad columns (their grad is identically zero)
    d_feats = [d if L["W"] == L["W_logical"] else d[:, :, :L["W_logical"]]
               for d, L in zip(d_feats, tiling.levels)]
    return d_feats


def bwd_kernel_supported(feat_shapes, window, strip_h: int = 128,
                         vmem_budget: int = 80 * 1024 * 1024) -> bool:
    """Static guard: True when the strip tiling fits this config.

    Mirrors the forward wrapper's spirit — any unsupported shape falls
    back to the exact XLA transpose, never errors."""
    sy, sx = window
    if strip_h < sy:
        return False
    b = feat_shapes[0][0]
    for (bb, h, w, c) in feat_shapes:
        if bb != b or h < sy or w < sy:   # narrow-W levels are x-padded
            return False
        if h > strip_h and h % strip_h != 0:
            return False
    return (_Tiling(feat_shapes, sy, strip_h, sx=sx).scratch_bytes()
            <= vmem_budget)
