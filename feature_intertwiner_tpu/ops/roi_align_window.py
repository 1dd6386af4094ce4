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
                       *level_refs_and_out, bt, sy, sx, ch, cw, ru,
                       dims):
    """pk_ref SMEM [N] int32 = lvl + b·4 + (x0//8)·2^8 + y0·2^16;
    y1/x1/y2/x2 SMEM [N] f32 normalized box coords;
    level_refs: len(dims) ANY refs [B,H_l,W_l,C]; out VMEM [BT, RU, C];
    scratch VMEM [2, sy, sx, C]; sems DMA [2]; dims = static (H_l, W_l)."""
    nlevels = len(dims)
    level_refs = level_refs_and_out[:nlevels]
    out_ref = level_refs_and_out[nlevels]
    scratch = level_refs_and_out[nlevels + 1]
    sems = level_refs_and_out[nlevels + 2]
    ti = pl.program_id(0)
    c = out_ref.shape[-1]

    def unpack(i):
        v = pk_ref[ti * bt + i]
        lvl = v % 4
        b = (v // 4) % 64
        x08 = (v // (2 ** 8)) % (2 ** 8)
        y0 = v // (2 ** 16)
        return lvl, b, y0, x08

    def start_dma(slot, i):
        lvl, b, y0, x08 = unpack(i)
        for l in range(nlevels):
            @pl.when(lvl == l)
            def _(l=l):
                pltpu.make_async_copy(
                    level_refs[l].at[b, pl.ds(y0, sy), pl.ds(x08 * 8, sx), :],
                    scratch.at[slot],
                    sems.at[slot],
                ).start()

    def wait_dma(slot, i):
        lvl, b, y0, x08 = unpack(i)
        for l in range(nlevels):
            @pl.when(lvl == l)
            def _(l=l):
                pltpu.make_async_copy(
                    level_refs[l].at[b, pl.ds(y0, sy), pl.ds(x08 * 8, sx), :],
                    scratch.at[slot],
                    sems.at[slot],
                ).wait()

    start_dma(0, 0)

    # Index planes for the SEPARABLE M build, shared across boxes. The
    # bilinear matrix factors exactly: M[r,(y,x)] = my[y,r]·mx[x,r] with
    # my = hat(py_r − y)·valid_y and mx likewise (hat and validity each
    # depend on one axis only) — so the per-box VPU work is ~8 ops on two
    # [S, RU] planes plus ONE outer-product multiply on [Sy·Sx, RU],
    # instead of ~8 ops on the full M plane (~7x less VPU). Built in the
    # TRANSPOSED [window, RU] orientation so the outer-product collapse
    # [Sy, Sx, RU] -> [Sy·Sx, RU] merges LEADING dims (the lane dim stays
    # intact — the same constraint the win collapse below satisfies).
    jj = (lax.broadcasted_iota(jnp.int32, (sy, ru), 1)
          // cw).astype(jnp.float32)             # output row of the crop
    yy = lax.broadcasted_iota(                   # window row (int iota:
        jnp.int32, (sy, ru), 0).astype(jnp.float32)  # tpu.iota is int-only)
    kk = (lax.broadcasted_iota(jnp.int32, (sx, ru), 1)
          % cw).astype(jnp.float32)              # output col of the crop
    xx = lax.broadcasted_iota(
        jnp.int32, (sx, ru), 0).astype(jnp.float32)  # window col

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

        lvl, _b, y0, x08 = unpack(i)
        hf = level_const(lvl, [d[0] for d in dims])
        wf = level_const(lvl, [d[1] for d in dims])
        y0f = y0.astype(jnp.float32)
        x0f = (x08 * 8).astype(jnp.float32)
        sy_abs, sty = grid_1d(y1_ref[g], y2_ref[g], ch, hf)
        sx_abs, stx = grid_1d(x1_ref[g], x2_ref[g], cw, wf)

        py = (sy_abs - y0f) + jj * sty            # window-relative sample y
        px = (sx_abs - x0f) + kk * stx
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - yy))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xx))
        vy = (py + y0f >= 0.0) & (py + y0f <= hf - 1.0)
        vx = (px + x0f >= 0.0) & (px + x0f <= wf - 1.0)
        my = jnp.where(vy, wy, 0.0)               # [Sy, RU]
        mx = jnp.where(vx, wx, 0.0)               # [Sx, RU]
        mt = (my[:, None, :] * mx[None, :, :]).reshape(sy * sx, ru)

        win = scratch[slot].reshape(sy * sx, c).astype(jnp.float32)
        # out = Mᵀᵀ @ win — contraction over the shared leading (window)
        # dim; Mosaic lowers the lhs-transposed matmul natively
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
    """Physical (zero-padded) map widths for window x-span ``sx``: levels
    narrower than the window are padded up to it so a window can always be
    DMA'd (out-of-map cells read zeros = their exact contribution)."""
    return jnp.maximum(jnp.asarray(widths, jnp.int32), jnp.int32(sx))


def window_origins_and_fits(boxes, level_idx, heights, widths, crop_size,
                            window, phys_widths=None):
    """Per-box DMA window origin + fit test — pure box math, no feature
    reads, so callers can also use it standalone as a cheap overflow
    diagnostic (VERDICT r3 #3). Returns (y0 [N] i32, x0 [N] i32, fits [N]).

    ``phys_widths``: per-level PHYSICAL widths when the feature arrays are
    zero-padded beyond the logical ``widths`` (the x-span may exceed a
    level's logical width — e.g. the default rectangular (32, 40) window on
    the 32-cell P5 map). Validity/taps use the logical dims; only the DMA
    reach (origin clamp) uses the physical dims."""
    ch, cw = crop_size
    sy, sx = window
    ys, yt, hf = _grid_params(boxes, level_idx, heights, widths, ch, axis=0)
    xs, xt, wf = _grid_params(boxes, level_idx, heights, widths, cw, axis=1)
    if phys_widths is None:
        phys_widths = phys_widths_for(widths, sx)
    pw = phys_widths[level_idx].astype(jnp.float32)

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

    y0, fit_y = origin_and_fit(ys, yt, ch, hf, hf, float(sy))
    x0, fit_x = origin_and_fit(xs, xt, cw, wf, pw, float(sx), align=8)
    return y0, x0, fit_y & fit_x


@functools.partial(
    jax.jit, static_argnames=("crop_size", "window", "box_tile", "interpret"))
def multilevel_roi_align_window(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    box_indices: jax.Array,
    level_idx: jax.Array,
    crop_size: Tuple[int, int],
    window: Tuple[int, int] = (32, 40),
    box_tile: int = 64,
    interpret: bool = False,
):
    """FPN RoIAlign via per-box window DMA.

    features: [P2..P5] NHWC (each H,W >= window); boxes [N,4] normalized;
    box_indices [N] int32; level_idx [N] int32 in [0, len(features)).
    Returns (crops [N, ch, cw, C], fits [N] bool). Values for ``~fits``
    boxes drop out-of-window taps — route those through the XLA path.
    """
    ch, cw = crop_size
    sy, sx = window
    n = boxes.shape[0]
    c = features[0].shape[-1]
    nlevels = len(features)
    dims = tuple((f.shape[1], f.shape[2]) for f in features)  # LOGICAL dims
    for f in features:
        assert f.shape[1] >= sy and f.shape[2] >= sy, (f.shape, window)
    assert sx % 8 == 0, "window width must be sublane-aligned"
    assert n > 0, "window kernel needs >=1 box (callers route n==0 to XLA)"
    # Levels narrower than the x-span are zero-padded up to it (the
    # rectangular default window's +8 x-pad exceeds e.g. the 32-cell P5
    # map). Out-of-map taps are masked by the logical-dim validity, so the
    # padding cells' zeros are exactly their true contribution.
    features = [f if f.shape[2] >= sx
                else jnp.pad(f, ((0, 0), (0, 0), (0, sx - f.shape[2]),
                                 (0, 0)))
                for f in features]
    # packed-word capacity (lvl 2b | batch 6b | x0//8 8b | y0 15b) — exceeding
    # any field would silently wrap and DMA windows from the wrong image/offset
    assert nlevels <= 4, nlevels
    assert features[0].shape[0] <= 64, (
        f"batch {features[0].shape[0]} > 64 overflows the 6-bit batch field")
    for f in features:
        assert (f.shape[2] - sx) // 8 < 256, (
            f"level width {f.shape[2]} overflows the 8-bit x0//8 field")
        assert f.shape[1] - sy < 2 ** 15, f.shape
    heights = jnp.array([d[0] for d in dims], jnp.int32)
    widths = jnp.array([d[1] for d in dims], jnp.int32)

    y0, x0, fits = window_origins_and_fits(
        boxes, level_idx, heights, widths, crop_size, window)

    bt = min(box_tile, n)
    n_pad = _pad_up(n, bt)
    ru = _pad_up(ch * cw, 8)

    # one packed int32 per box (SMEM budget — see module docstring):
    # lvl (2b) | batch (6b) | x0//8 (8b) | y0 (12b)
    packed = (level_idx.astype(jnp.int32)
              + box_indices.astype(jnp.int32) * 4
              + (x0 // 8) * (2 ** 8)
              + y0 * (2 ** 16))
    coords = [boxes[:, i].astype(jnp.float32) for i in range(4)]
    if n_pad != n:
        packed = jnp.pad(packed, (0, n_pad - n))
        coords = [jnp.pad(v, (0, n_pad - n)) for v in coords]

    kernel = functools.partial(
        _window_roi_kernel, bt=bt, sy=sy, sx=sx, ch=ch, cw=cw, ru=ru,
        dims=dims)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlevels,
        out_specs=pl.BlockSpec((bt, ru, c), lambda ti, *_: (ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sy, sx, c), features[0].dtype),
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
                   window, fallback_k, interpret):
    return _hybrid_fwd_impl(features, boxes, box_indices, level_idx,
                            crop_size, window, fallback_k, interpret)


def _hybrid_fwd_impl(features, boxes, box_indices, level_idx, crop_size,
                     window, fallback_k, interpret):
    crops, fits = multilevel_roi_align_window(
        features, boxes, box_indices, level_idx, crop_size, window=window,
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


def _hybrid_fwd(features, boxes, box_indices, level_idx, crop_size, window,
                fallback_k, interpret):
    out = _hybrid_fwd_impl(features, boxes, box_indices, level_idx,
                           crop_size, window, fallback_k, interpret)
    return out, (features, boxes, box_indices, level_idx)


def _hybrid_bwd(crop_size, window, fallback_k, interpret, res, g):
    features, boxes, box_indices, level_idx = res
    feat_shapes = tuple(tuple(f.shape) for f in features)

    from .roi_align_window_bwd import (
        bwd_kernel_supported, multilevel_roi_align_window_bwd)
    if bwd_kernel_supported(feat_shapes, window):
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


def _window_path_active(features, window):
    """True when multilevel_crop_and_resize_window would actually run the
    hybrid kernel (same guards, kept adjacent so they cannot drift). Maps
    narrower than the x-span are allowed (the wrapper zero-pads them); the
    square ``sy`` side is the activation floor in both axes."""
    sy, sx = window
    return not (
        len(features) > 4
        or features[0].shape[0] > 64              # 6-bit batch field
        or any(f.shape[1] < sy or f.shape[2] < sy for f in features)
        or any((max(f.shape[2], sx) - sx) // 8 >= 256  # 8-bit x0//8 field
               or f.shape[1] - sy >= 2 ** 15 for f in features))


def hybrid_unfit_overflow(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    level_idx: jax.Array,
    crop_size: Tuple[int, int],
    window: Tuple[int, int] = (32, 40),
    fallback_div: int = 16,
) -> jax.Array:
    """Count of boxes whose values the hybrid silently tap-truncates.

    The hybrid routes the ``fallback_k`` most-unfit boxes through the exact
    XLA path; any unfit boxes beyond that budget keep window values with
    out-of-window taps dropped (docstring above). This counter —
    ``max(0, n_unfit - fallback_k)``, int32 scalar, 0 when the wrapper
    would route entirely to XLA — is the silent-degradation signal VERDICT
    r3 #3 asks to surface in metrics: production shapes must keep it 0.

    Pure box math (window_origins_and_fits) — costs nothing next to the
    pooling itself."""
    n = boxes.shape[0]
    if n == 0 or not _window_path_active(features, window):
        return jnp.zeros((), jnp.int32)
    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    _, _, fits = window_origins_and_fits(
        boxes, level_idx.astype(jnp.int32), heights, widths,
        tuple(crop_size), tuple(window))
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
):
    """Drop-in for ops.roi_align.multilevel_crop_and_resize backed by the
    window-DMA kernel (1.26-1.62x on v5e), with an exact XLA fallback for
    the unfit tail and the same custom-vjp backward as the gather path.

    ``fallback_div``: the exact-XLA fallback budget is ``max(8,
    n // fallback_div)`` — 16 (6.25%) covers object-like distributions
    (unfit ~0.4% at the rectangular default window). The inference-time
    CLASSIFIER pooling runs the full 1000-proposal list whose low-score
    noise tail has arbitrary aspect ratios (~12.7% unfit measured on a
    converged synthetic model, results/audit/) — the intertwiner passes 4
    (25%) there so eval detections stay exact, at ~linear gather cost for
    the covered fraction.

    Guards: maps smaller than the window (images < 1024² shrink P5 below
    32 cells) fall back to the pure XLA path entirely, and non-TPU
    backends run the kernel in interpret mode — so the flag is safe at any
    config, and tests/virtual-CPU meshes exercise the same code path.
    """
    if level_idx is None:
        level_idx = assign_fpn_level(boxes, image_shape, base=assign_base) - 2
    sy, sx = window
    if boxes.shape[0] == 0 or not _window_path_active(features, window):
        return multilevel_crop_and_resize(
            list(features), boxes, box_indices, crop_size, image_shape,
            level_idx=level_idx)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = boxes.shape[0]
    fallback_k = min(n, max(8, n // fallback_div))
    return _window_hybrid(
        tuple(features), boxes, box_indices.astype(jnp.int32),
        level_idx.astype(jnp.int32), tuple(crop_size), (sy, sx), fallback_k,
        bool(interpret))
