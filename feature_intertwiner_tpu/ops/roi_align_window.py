"""Window-DMA Pallas RoIAlign — the round-2 analysis' one unexplored door.

The production RoIAlign (ops/roi_align.py::multilevel_crop_and_resize) runs
at the measured XLA row-gather wall (~45 GB/s). The round-2 rejection
analysis (ops/roi_align.py:33-60) left exactly one formulation unmeasured:
manually DMA each box's [Sy,Sx,C] feature window HBM->VMEM (dynamic
offsets, double-buffered — the paged-attention pattern) and interpolate
on the MXU. This module is that kernel, built for the multilevel (FPN)
path (reference semantics: crop_and_resize_kernel.cu:17-82 applied per
pyramid level, lib/layers.py:145-218).

Design (per grid step = one tile of BT boxes):

- per-box window origin + level are scalar-prefetched PACKED into one
  int32 per box and box coords as four 1-D f32 arrays — 2-D [N,k]
  prefetch operands are lane-padded to [N,128] in SMEM and blow the 1 MB
  SMEM budget at production box counts (measured: a [4096,3] i32 operand
  allocates 2 MB and refuses to compile);
- window x-origins are stored as x0//8 and multiplied back in-kernel:
  Mosaic must SYNTACTICALLY prove a dynamic HBM slice start in the
  lane-tiled W dimension divisible by the 8-wide sublane tile;
- the box's level map is one of four ANY/HBM refs; one `pl.when` branch
  per level starts (and later waits) the window DMA into a shared
  double-buffered VMEM scratch — boxes on other levels skip the copy;
- interpolation is ONE MXU matmul per box: ``out = M @ win``, where
  ``win`` is the window collapsed to [Sy·Sx, C] (leading-dim collapse —
  the lane dim stays intact, unlike the [H,W,C]->[H,W·C] merge Mosaic
  rejects) and ``M`` [RU, Sy·Sx] is the combined bilinear matrix built
  directly from 2-D iotas with the hat function
  ``w(p, t) = max(0, 1-|p-t|)`` — for in-range positions this equals the
  reference's floor/ceil two-tap weights exactly (integer positions give
  the single tap weight 1), and out-of-range samples are zeroed
  (extrapolation_value=0, the only value the model uses).

A box "fits" when its (clipped, alignment-adjusted) sample-grid span is
<= the static window along both axes; the wrapper returns a per-box
``fits`` mask. For boxes that do not fit (extreme aspect ratios at a
clamped level), taps outside the window are silently dropped by the hat
function — callers that need exact values everywhere must route ``~fits``
boxes through the XLA path.

Measured on v5e (scripts/profile_window_dma.py, scripts/profile_roi_window.py)
— see the README "Performance" section for the verdict.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import assign_fpn_level, multilevel_crop_and_resize


def _pad_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _window_roi_kernel(pk_ref, y1_ref, x1_ref, y2_ref, x2_ref,
                       *level_refs_and_out, bt, windows, ch, cw, ru,
                       dims):
    """pk_ref SMEM [N] int32 = lvl + b·4 + (x0//8)·2^8 + cls·2^16 + y0·2^18;
    y1/x1/y2/x2 SMEM [N] f32 normalized box coords;
    level_refs: len(dims) ANY refs [B,H_l,W_l,C]; out VMEM [BT, RU, C];
    one scratch VMEM [2, sy_k, sx_k, C] per window class; sems DMA [2];
    dims = static LOGICAL (H_l, W_l).

    ``windows`` is the tuple of shape-class windows (≤4, the 2-bit cls
    field). Every box carries its class in the packed word; each class has
    its own double-buffered scratch and its own separable-M build, so the
    per-box cost stays one DMA + one MXU matmul at that class's window
    size regardless of how many classes exist."""
    nlevels = len(dims)
    ncls = len(windows)
    level_refs = level_refs_and_out[:nlevels]
    out_ref = level_refs_and_out[nlevels]
    scratches = level_refs_and_out[nlevels + 1:nlevels + 1 + ncls]
    sems = level_refs_and_out[nlevels + 1 + ncls]
    ti = pl.program_id(0)
    c = out_ref.shape[-1]

    def unpack(i):
        v = pk_ref[ti * bt + i]
        lvl = v % 4
        b = (v // 4) % 64
        x08 = (v // (2 ** 8)) % (2 ** 8)
        kc = (v // (2 ** 16)) % 4
        y0 = v // (2 ** 18)
        return lvl, b, y0, x08, kc

    def dma_for(k, l, slot, b, y0, x08):
        sy, sx = windows[k]
        return pltpu.make_async_copy(
            level_refs[l].at[b, pl.ds(y0, sy), pl.ds(x08 * 8, sx), :],
            scratches[k].at[slot],
            sems.at[slot],
        )

    def start_dma(slot, i):
        lvl, b, y0, x08, kc = unpack(i)
        for k in range(ncls):
            @pl.when(kc == k)
            def _(k=k):
                for l in range(nlevels):
                    @pl.when(lvl == l)
                    def _(k=k, l=l):
                        dma_for(k, l, slot, b, y0, x08).start()

    def wait_dma(slot, i):
        lvl, b, y0, x08, kc = unpack(i)
        for k in range(ncls):
            @pl.when(kc == k)
            def _(k=k):
                for l in range(nlevels):
                    @pl.when(lvl == l)
                    def _(k=k, l=l):
                        dma_for(k, l, slot, b, y0, x08).wait()

    start_dma(0, 0)

    # Index planes for the SEPARABLE M build, shared across boxes and built
    # once per class. The bilinear matrix factors exactly:
    # M[r,(y,x)] = my[y,r]·mx[x,r] with my = hat(py_r − y)·valid_y and mx
    # likewise (hat and validity each depend on one axis only) — so the
    # per-box VPU work is ~8 ops on two [S, RU] planes plus ONE
    # outer-product multiply on [Sy·Sx, RU], instead of ~8 ops on the full
    # M plane (~7x less VPU). Built in the TRANSPOSED [window, RU]
    # orientation so the outer-product collapse [Sy, Sx, RU] ->
    # [Sy·Sx, RU] merges LEADING dims (the lane dim stays intact — the
    # same constraint the win collapse below satisfies).
    planes = []
    for (sy, sx) in windows:
        jj = (lax.broadcasted_iota(jnp.int32, (sy, ru), 1)
              // cw).astype(jnp.float32)         # output row of the crop
        yy = lax.broadcasted_iota(               # window row (int iota:
            jnp.int32, (sy, ru), 0).astype(jnp.float32)  # tpu.iota int-only
        kk = (lax.broadcasted_iota(jnp.int32, (sx, ru), 1)
              % cw).astype(jnp.float32)          # output col of the crop
        xx = lax.broadcasted_iota(
            jnp.int32, (sx, ru), 0).astype(jnp.float32)  # window col
        planes.append((jj, yy, kk, xx))

    def level_const(lvl, values):
        out = jnp.float32(values[-1])
        for l in range(nlevels - 2, -1, -1):
            out = jnp.where(lvl == l, jnp.float32(values[l]), out)
        return out

    def grid_1d(c0, c1, crop, dim):
        if crop > 1:
            start = c0 * (dim - 1.0)
            step = (c1 - c0) * (dim - 1.0) / (crop - 1)
        else:
            start = 0.5 * (c0 + c1) * (dim - 1.0)
            step = jnp.float32(0.0)
        return start, step

    def body(i, _):
        g = ti * bt + i
        slot = lax.rem(i, 2)
        nxt = lax.rem(i + 1, 2)

        @pl.when(i + 1 < bt)
        def _():
            start_dma(nxt, i + 1)

        wait_dma(slot, i)

        lvl, _b, y0, x08, kc = unpack(i)
        hf = level_const(lvl, [d[0] for d in dims])
        wf = level_const(lvl, [d[1] for d in dims])
        y0f = y0.astype(jnp.float32)
        x0f = (x08 * 8).astype(jnp.float32)
        sy_abs, sty = grid_1d(y1_ref[g], y2_ref[g], ch, hf)
        sx_abs, stx = grid_1d(x1_ref[g], x2_ref[g], cw, wf)

        for k, (sy, sx) in enumerate(windows):
            @pl.when(kc == k)
            def _(k=k, sy=sy, sx=sx):
                jj, yy, kk, xx = planes[k]
                py = (sy_abs - y0f) + jj * sty    # window-relative sample y
                px = (sx_abs - x0f) + kk * stx
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - yy))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xx))
                vy = (py + y0f >= 0.0) & (py + y0f <= hf - 1.0)
                vx = (px + x0f >= 0.0) & (px + x0f <= wf - 1.0)
                my = jnp.where(vy, wy, 0.0)       # [Sy, RU]
                mx = jnp.where(vx, wx, 0.0)       # [Sx, RU]
                mt = (my[:, None, :] * mx[None, :, :]).reshape(sy * sx, ru)

                win = scratches[k][slot].reshape(
                    sy * sx, c).astype(jnp.float32)
                # out = Mᵀᵀ @ win — contraction over the shared leading
                # (window) dim; Mosaic lowers the lhs-transposed matmul
                # natively
                vals = lax.dot_general(
                    mt, win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[i, :, :] = vals.astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, bt, body, 0)


def _grid_params(boxes, level_idx, heights, widths, crop, axis):
    """Per-box sampling-grid start/step in that level's cell units."""
    dim = (heights if axis == 0 else widths)[level_idx].astype(jnp.float32)
    c0 = boxes[:, 0 + axis]
    c1 = boxes[:, 2 + axis]
    if crop > 1:
        start = c0 * (dim - 1.0)
        step = (c1 - c0) * (dim - 1.0) / (crop - 1)
    else:
        start = 0.5 * (c0 + c1) * (dim - 1.0)
        step = jnp.zeros_like(start)
    return start, step, dim


def phys_widths_for(widths, sx):
    """Physical (zero-padded) map widths for window x-span ``sx``.

    Two requirements: (a) levels narrower than the window are padded up to
    it so a window can always be DMA'd (out-of-map cells read zeros =
    their exact contribution); (b) widths are rounded up to the 8-cell
    sublane tile — with ``sx`` a multiple of 8, the DMA-origin clamp bound
    (phys − sx) is then itself 8-aligned, so clipping + re-aligning can
    never slide a right-edge box's window below its span (a box with
    hi ≤ W−1 always fits: span from the clamped origin ≤ sx + W −
    pad_up(W, 8) ≤ sx). Maps whose width is already a multiple of 8
    (all 1024² pyramid levels) are untouched."""
    w = jnp.asarray(widths, jnp.int32)
    return jnp.maximum((w + 7) // 8 * 8, jnp.int32(sx))


def shape_class_windows(window):
    """Shape-class window set derived from the primary ``window`` geometry.

    The primary (sy, sy+8) covers the FPN assignment band's square-ish
    footprints (≤ ~sy cells per axis — level assignment is by absolute
    pixel size vs strides, so footprints in CELLS are image-scale
    invariant). Two equal-VMEM-budget aspect classes extend coverage to
    the proposal noise tail's extreme shapes (VERDICT r4 #3):

      wide-flat : (sy/2, 2·sy+8↑8) — half the rows, double+slack columns
      tall-thin : (2·sy, sy/2+8↑8) — double rows, the x-align slack only

    (↑8 = rounded up to the 8-wide sublane tile.) For sy=32 this is
    ((32, 40), (16, 72), (64, 24)): y/x capacities (post the worst-case
    7-cell x-align loss) of 32/33, 16/65 and 64/17 cells."""
    sy, sx = window
    wide = (max(sy // 2, 8), _pad_up(2 * sy + 8, 8))
    tall = (2 * sy, _pad_up(sy // 2 + 8, 8))
    return ((sy, sx), wide, tall)


def window_origins_and_fits(boxes, level_idx, heights, widths, crop_size,
                            window, phys_widths=None, phys_heights=None):
    """Per-box DMA window origin + fit test — pure box math, no feature
    reads, so callers can also use it standalone as a cheap overflow
    diagnostic (VERDICT r3 #3). Returns (y0 [N] i32, x0 [N] i32, fits [N]).

    ``phys_widths`` / ``phys_heights``: per-level PHYSICAL dims when the
    feature arrays are zero-padded beyond the logical dims (a span may
    exceed a level's logical size — e.g. the default rectangular (32, 40)
    window on the 32-cell P5 map, or any map of an image below 1024²).
    Validity/taps use the logical dims; only the DMA reach (origin clamp)
    uses the physical dims."""
    ch, cw = crop_size
    sy, sx = window
    ys, yt, hf = _grid_params(boxes, level_idx, heights, widths, ch, axis=0)
    xs, xt, wf = _grid_params(boxes, level_idx, heights, widths, cw, axis=1)
    if phys_widths is None:
        phys_widths = phys_widths_for(widths, sx)
    if phys_heights is None:
        phys_heights = jnp.maximum(jnp.asarray(heights, jnp.int32),
                                   jnp.int32(sy))
    pw = phys_widths[level_idx].astype(jnp.float32)
    ph = phys_heights[level_idx].astype(jnp.float32)

    def origin_and_fit(start, step, crop, dim, phys_dim, span, align=1):
        # align: Mosaic requires dynamic HBM slice starts in the lane-tiled
        # W dimension to be divisible by the 8-wide sublane tile; y starts
        # are unconstrained. Aligning down costs up to align-1 cells of the
        # window's usable span (folded into the fit test); the default
        # window's x-span carries a +8 pad to absorb exactly this loss.
        end = start + step * (crop - 1)
        lo = jnp.clip(jnp.floor(jnp.minimum(start, end)), 0, dim - 1.0)
        hi = jnp.clip(jnp.ceil(jnp.maximum(start, end)), 0, dim - 1.0)
        if align > 1:
            lo = jnp.floor(lo / align) * align
        # The DMA origin must satisfy o + span <= phys_dim, so clip to
        # phys_dim - span (and re-align down: the bound need not be a
        # multiple of align). The fit test MUST use the final origin o, not
        # lo — when the bound is not a multiple of align the clip+realign
        # can slide the window left of lo, and a test against lo would keep
        # fits=True while right-edge taps fall outside the window (silently
        # zeroed by the hat weights).
        o = jnp.clip(lo, 0.0, jnp.maximum(phys_dim - span, 0.0))
        if align > 1:
            o = jnp.floor(o / align) * align
        fits = hi - o + 1.0 <= span
        return o.astype(jnp.int32), fits

    y0, fit_y = origin_and_fit(ys, yt, ch, hf, ph, float(sy))
    x0, fit_x = origin_and_fit(xs, xt, cw, wf, pw, float(sx), align=8)
    return y0, x0, fit_y & fit_x


@functools.partial(
    jax.jit,
    static_argnames=("crop_size", "window", "windows", "box_tile",
                     "interpret"))
def multilevel_roi_align_window(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    box_indices: jax.Array,
    level_idx: jax.Array,
    crop_size: Tuple[int, int],
    window: Tuple[int, int] = (32, 40),
    windows: Tuple[Tuple[int, int], ...] = None,
    box_tile: int = 64,
    interpret: bool = False,
):
    """FPN RoIAlign via per-box window DMA.

    features: [P2..P5] NHWC (maps smaller than a window span are
    zero-padded — the kernel is resolution-general, VERDICT r4 #3);
    boxes [N,4] normalized; box_indices [N] int32; level_idx [N] int32 in
    [0, len(features)). ``windows`` (≤4 shape classes, default just
    ``window``): each box uses the FIRST class whose span fits its
    footprint; class 0 is also the truncation window for boxes fitting
    none. Returns (crops [N, ch, cw, C], fits [N] bool — any class fits).
    Values for ``~fits`` boxes drop out-of-window taps — route those
    through the XLA path.
    """
    ch, cw = crop_size
    if windows is None:
        windows = (tuple(window),)
    n = boxes.shape[0]
    c = features[0].shape[-1]
    nlevels = len(features)
    dims = tuple((f.shape[1], f.shape[2]) for f in features)  # LOGICAL dims
    for (sy, sx) in windows:
        assert sx % 8 == 0, "window width must be sublane-aligned"
    assert 1 <= len(windows) <= 4, "2-bit class field"
    assert n > 0, "window kernel needs >=1 box (callers route n==0 to XLA)"
    sy_max = max(sy for sy, _ in windows)
    sx_max = max(sx for _, sx in windows)
    sy_min = min(sy for sy, _ in windows)
    sx_min = min(sx for _, sx in windows)
    # Levels smaller than any class's span are zero-padded up to the max
    # span in that axis (e.g. the rectangular default's +8 x-pad exceeds
    # the 32-cell P5 map; every map of an 800² image is shorter than the
    # tall class), and widths additionally round up to the 8-cell sublane
    # tile (phys_widths_for: keeps the aligned origin clamp from unfitting
    # right-edge boxes on non-multiple-of-8 maps, e.g. 800²'s 100-wide
    # P3). Out-of-map taps are masked by the logical-dim validity, so the
    # padding cells' zeros are exactly their true contribution.
    def _phys_hw(f):
        return (max(f.shape[1], sy_max),
                max((f.shape[2] + 7) // 8 * 8, sx_max))

    features = [
        f if (f.shape[1], f.shape[2]) == _phys_hw(f)
        else jnp.pad(f, ((0, 0), (0, _phys_hw(f)[0] - f.shape[1]),
                         (0, _phys_hw(f)[1] - f.shape[2]), (0, 0)))
        for f in features]
    # packed-word capacity (lvl 2b | batch 6b | x0//8 8b | cls 2b | y0 13b)
    # — exceeding any field would silently wrap and DMA windows from the
    # wrong image/offset
    assert nlevels <= 4, nlevels
    assert features[0].shape[0] <= 64, (
        f"batch {features[0].shape[0]} > 64 overflows the 6-bit batch field")
    for f in features:
        assert (f.shape[2] - sx_min) // 8 < 256, (
            f"level width {f.shape[2]} overflows the 8-bit x0//8 field")
        assert f.shape[1] - sy_min < 2 ** 13, f.shape
    heights = jnp.array([d[0] for d in dims], jnp.int32)
    widths = jnp.array([d[1] for d in dims], jnp.int32)
    phys_heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    phys_widths = jnp.array([f.shape[2] for f in features], jnp.int32)

    # per-class origins + fit, then each box takes the first fitting class
    # (class 0 when none fits — its window truncates the out-of-range taps)
    per_cls = [window_origins_and_fits(
        boxes, level_idx, heights, widths, crop_size, w,
        phys_widths=phys_widths, phys_heights=phys_heights)
        for w in windows]
    y0, x0, fits = per_cls[0]
    cls = jnp.zeros_like(level_idx)
    for k in range(1, len(windows)):
        y0k, x0k, fitk = per_cls[k]
        take = ~fits & fitk
        cls = jnp.where(take, k, cls)
        y0 = jnp.where(take, y0k, y0)
        x0 = jnp.where(take, x0k, x0)
        fits = fits | fitk

    bt = min(box_tile, n)
    n_pad = _pad_up(n, bt)
    ru = _pad_up(ch * cw, 8)

    # one packed int32 per box (SMEM budget — see module docstring)
    packed = (level_idx.astype(jnp.int32)
              + box_indices.astype(jnp.int32) * 4
              + (x0 // 8) * (2 ** 8)
              + cls * (2 ** 16)
              + y0 * (2 ** 18))
    coords = [boxes[:, i].astype(jnp.float32) for i in range(4)]
    if n_pad != n:
        packed = jnp.pad(packed, (0, n_pad - n))
        coords = [jnp.pad(v, (0, n_pad - n)) for v in coords]

    kernel = functools.partial(
        _window_roi_kernel, bt=bt, windows=tuple(windows), ch=ch, cw=cw,
        ru=ru, dims=dims)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlevels,
        out_specs=pl.BlockSpec((bt, ru, c), lambda ti, *_: (ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sy, sx, c), features[0].dtype)
            for (sy, sx) in windows
        ] + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, ru, c), features[0].dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed, coords[0], coords[1], coords[2], coords[3], *features)
    crops = out[:n, : ch * cw, :].reshape(n, ch, cw, c)
    return crops, fits


# ---------------------------------------------------------------------------
# Production hybrid: window kernel + exact XLA fallback + autodiff
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_hybrid(features, boxes, box_indices, level_idx, crop_size,
                   windows, fallback_k, interpret):
    return _hybrid_fwd_impl(features, boxes, box_indices, level_idx,
                            crop_size, windows, fallback_k, interpret)


def _hybrid_fwd_impl(features, boxes, box_indices, level_idx, crop_size,
                     windows, fallback_k, interpret):
    crops, fits = multilevel_roi_align_window(
        features, boxes, box_indices, level_idx, crop_size, windows=windows,
        interpret=interpret)
    n = boxes.shape[0]
    k = min(n, fallback_k)
    # exact values for the unfit tail: route the k most-unfit boxes through
    # the XLA row gather (k >> the measured ~3% unfit rate; should a batch
    # ever exceed k unfit boxes, the overflow keeps window values — taps
    # outside the window dropped)
    score = (~fits).astype(jnp.float32)
    _, idx = lax.top_k(score, k)
    sub = multilevel_crop_and_resize(
        list(features), boxes[idx], box_indices[idx], crop_size,
        (1, 1), level_idx=level_idx[idx])
    take = (~fits)[idx][:, None, None, None]
    merged = crops.at[idx].set(
        jnp.where(take, sub.astype(crops.dtype), crops[idx]))
    return merged


def _hybrid_fwd(features, boxes, box_indices, level_idx, crop_size, windows,
                fallback_k, interpret):
    out = _hybrid_fwd_impl(features, boxes, box_indices, level_idx,
                           crop_size, windows, fallback_k, interpret)
    return out, (features, boxes, box_indices, level_idx)


def _hybrid_bwd(crop_size, windows, fallback_k, interpret, res, g):
    features, boxes, box_indices, level_idx = res
    feat_shapes = tuple(tuple(f.shape) for f in features)
    window = windows[0]

    from .roi_align_window_bwd import (
        bwd_kernel_supported, multilevel_roi_align_window_bwd)
    # Shape-classed pooling (len(windows) > 1) is an EVAL-side feature
    # (models/intertwiner.py uses it only on the no-grad inference
    # classifier pooling); its backward takes the exact-XLA transpose
    # below — exact for every box that fits some class (the forward is the
    # exact pooling there), approximate only for unfit boxes past the
    # fallback budget, whose forward values are already tap-truncated.
    if len(windows) == 1 and bwd_kernel_supported(feat_shapes, window):
        # TPU-native backward (VERDICT r3 #4): strip-tiled Pallas
        # accumulation instead of the XLA gather-transpose scatter-add.
        # Mirror the forward's routing exactly — boxes whose forward value
        # came from the exact-XLA fallback (idx ∩ ~fits, _hybrid_fwd_impl)
        # backprop through the XLA transpose; everything else through the
        # window-transpose kernel (for fit boxes the two are the same
        # linear map; for tap-truncated boxes the kernel transposes the
        # truncation the forward actually applied).
        n = boxes.shape[0]
        heights = jnp.array([s[1] for s in feat_shapes], jnp.int32)
        widths = jnp.array([s[2] for s in feat_shapes], jnp.int32)
        _, _, fits = window_origins_and_fits(
            boxes, level_idx, heights, widths, crop_size, window)
        k = min(n, fallback_k)
        _, idx = lax.top_k((~fits).astype(jnp.float32), k)
        took_xla = jnp.zeros((n,), bool).at[idx].set(~fits[idx])
        g32 = g.astype(jnp.float32)
        g_win = g32 * (~took_xla)[:, None, None, None]
        d_feats = multilevel_roi_align_window_bwd(
            g_win, boxes, box_indices, level_idx, feat_shapes, crop_size,
            window, interpret=interpret)

        def sub_fn(feats):
            return multilevel_crop_and_resize(
                list(feats), boxes[idx], box_indices[idx], crop_size,
                (1, 1), level_idx=level_idx[idx])

        g_xla = g32[idx] * (~fits)[idx][:, None, None, None]
        (d_sub,) = jax.linear_transpose(sub_fn, tuple(features))(g_xla)
        d_feats = [a + b.astype(jnp.float32)
                   for a, b in zip(d_feats, d_sub)]
        return (tuple(d.astype(f.dtype)
                      for d, f in zip(d_feats, features)),
                jnp.zeros_like(boxes), None, None)

    def ref_fn(feats):
        return multilevel_crop_and_resize(
            list(feats), boxes, box_indices, crop_size, (1, 1),
            level_idx=level_idx)

    # linear_transpose, not jax.vjp: pooling is linear in the features for
    # fixed boxes, so the backward needs only the transposed scatter-add —
    # vjp would trace a full primal gather forward just to linearize it
    vjp = jax.linear_transpose(ref_fn, tuple(features))
    (d_feats,) = vjp(g.astype(jnp.float32))
    # boxes/box_indices/level_idx are non-differentiable (parity: the
    # reference's CropAndResizeFunction never backprops into box coords)
    return (tuple(d.astype(f.dtype) for d, f in zip(d_feats, features)),
            jnp.zeros_like(boxes), None, None)


_window_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def _window_path_active(features, windows):
    """True when multilevel_crop_and_resize_window would actually run the
    hybrid kernel (same guards, kept adjacent so they cannot drift).

    Maps smaller than a window span are allowed at ANY image size (the
    wrapper zero-pads them — resolution-general, VERDICT r4 #3); the only
    size floor is economic, not correctness: when the base P2 map is
    smaller than twice the primary window side the whole pyramid is tiny
    and the XLA gather is already trivially cheap (also keeps small-image
    CPU tests off the slow interpret-mode kernel)."""
    sy0 = windows[0][0]
    sy_min = min(sy for sy, _ in windows)
    sx_min = min(sx for _, sx in windows)
    sy_max = max(sy for sy, _ in windows)
    sx_max = max(sx for _, sx in windows)
    return not (
        len(features) > 4
        or features[0].shape[0] > 64              # 6-bit batch field
        or min(features[0].shape[1], features[0].shape[2]) < 2 * sy0
        or any((max(f.shape[2], sx_max) - sx_min) // 8 >= 256  # x0//8 field
               or max(f.shape[1], sy_max) - sy_min >= 2 ** 13
               for f in features))


def window_path_active_for_image(image_size: int, window_side: int,
                                 batch: int = 1) -> bool:
    """Static predicate: will the production pooling run the window kernel
    at this image size? Mirrors _window_path_active over the standard FPN
    pyramid shapes (P2..P5 = size/4 .. size/32) — used by the eval loop to
    LOG per-scale kernel activity in multi-scale testing (VERDICT r4 #3:
    no scale may silently drop off the production kernel unannounced)."""
    shapes = [jax.ShapeDtypeStruct(
        (batch, int(image_size) // s, int(image_size) // s, 1), jnp.float32)
        for s in (4, 8, 16, 32)]
    return _window_path_active(
        shapes, ((int(window_side), int(window_side) + 8),))


def hybrid_unfit_overflow(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    level_idx: jax.Array,
    crop_size: Tuple[int, int],
    window: Tuple[int, int] = (32, 40),
    fallback_div: int = 16,
    shape_classes: bool = False,
) -> jax.Array:
    """Count of boxes whose values the hybrid silently tap-truncates.

    The hybrid routes the ``fallback_k`` most-unfit boxes through the exact
    XLA path; any unfit boxes beyond that budget keep window values with
    out-of-window taps dropped (docstring above). This counter —
    ``max(0, n_unfit - fallback_k)``, int32 scalar, 0 when the wrapper
    would route entirely to XLA — is the silent-degradation signal VERDICT
    r3 #3 asks to surface in metrics: production shapes must keep it 0.
    ``shape_classes`` must mirror the pooling call's flag: a box counts as
    fit when ANY class window fits it.

    Pure box math (window_origins_and_fits) — costs nothing next to the
    pooling itself."""
    n = boxes.shape[0]
    windows = (shape_class_windows(tuple(window)) if shape_classes
               else (tuple(window),))
    if n == 0 or not _window_path_active(features, windows):
        return jnp.zeros((), jnp.int32)
    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    sy_max = max(sy for sy, _ in windows)
    sx_max = max(sx for _, sx in windows)
    ph = jnp.maximum(heights, sy_max)
    pw = phys_widths_for(widths, sx_max)
    fits = jnp.zeros((n,), bool)
    for w in windows:
        _, _, f = window_origins_and_fits(
            boxes, level_idx.astype(jnp.int32), heights, widths,
            tuple(crop_size), w, phys_widths=pw, phys_heights=ph)
        fits = fits | f
    fallback_k = min(n, max(8, n // fallback_div))
    n_unfit = jnp.sum((~fits).astype(jnp.int32))
    return jnp.maximum(0, n_unfit - fallback_k)


def multilevel_crop_and_resize_window(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    box_indices: jax.Array,
    crop_size: Tuple[int, int],
    image_shape: Tuple[int, int],
    assign_base: float = 224.0,
    level_idx: jax.Array = None,
    window: Tuple[int, int] = (32, 40),
    interpret: bool = None,
    fallback_div: int = 16,
    shape_classes: bool = False,
):
    """Drop-in for ops.roi_align.multilevel_crop_and_resize backed by the
    window-DMA kernel (1.26-1.62x on v5e), with an exact XLA fallback for
    the unfit tail and the same custom-vjp backward as the gather path.

    ``fallback_div``: the exact-XLA fallback budget is ``max(8,
    n // fallback_div)`` — 16 (6.25%) covers object-like distributions
    (unfit ~0.4% at the rectangular default window).

    ``shape_classes``: adds the wide-flat and tall-thin window classes
    (shape_class_windows) so the proposal noise tail's extreme aspect
    ratios pool in-kernel instead of eating the fallback budget — the
    inference-time CLASSIFIER pooling (full 1000-proposal list, ~12.7%
    unfit at the single (32, 40) window) runs with this on, which lets its
    budget shrink back from the round-4 n//4 to n//16 (VERDICT r4 #3).
    Eval-side only: the multi-class backward routes through the exact XLA
    transpose (_hybrid_bwd), so keep it off pooling that backprops.

    Guards: the kernel is resolution-general (short maps are zero-padded
    per-axis — the 800/1280 scales of ``TEST.MULTI_SCALE`` run it too);
    only a pyramid whose base map is smaller than twice the window side
    falls back to pure XLA (tiny images — gather is already cheap there).
    Non-TPU backends run the kernel in interpret mode — so the flag is
    safe at any config, and tests/virtual-CPU meshes exercise the same
    code path.
    """
    if level_idx is None:
        level_idx = assign_fpn_level(boxes, image_shape, base=assign_base) - 2
    windows = (shape_class_windows(tuple(window)) if shape_classes
               else (tuple(window),))
    if boxes.shape[0] == 0 or not _window_path_active(features, windows):
        return multilevel_crop_and_resize(
            list(features), boxes, box_indices, crop_size, image_shape,
            level_idx=level_idx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = boxes.shape[0]
    fallback_k = min(n, max(8, n // fallback_div))
    return _window_hybrid(
        tuple(features), boxes, box_indices.astype(jnp.int32),
        level_idx.astype(jnp.int32), tuple(crop_size), windows, fallback_k,
        bool(interpret))
