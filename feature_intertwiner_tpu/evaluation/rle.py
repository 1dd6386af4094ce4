"""COCO RLE mask utilities: ctypes binding over the native C++ library.

Capability parity with the reference's vendored ``pycocotools.mask`` +
``maskApi.c`` (SURVEY.md §2.2): encode/decode/merge/area/IoU/bbox/polygon
rasterization, plus the COCO compressed-counts string codec. The hot loops
(run-length walks, polygon fill) run in C++ (native/maskrle.cpp), compiled on
first import with g++ and cached next to the package; a pure-numpy fallback
covers environments without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Union

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "maskrle.cpp")
_LIB_PATH = os.path.join(_HERE, "..", "native", "libmaskrle.so")
_MAX_COUNTS = 4_000_000


def _build_library() -> Optional[ctypes.CDLL]:
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            # compile to a private temp file and rename: two processes
            # first-importing concurrently must not interleave writes into
            # the same .so (rename is atomic within the directory; the
            # loser's rename just replaces the winner's identical binary)
            tmp = f"{_LIB_PATH}.build{os.getpid()}"
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", tmp])
            os.replace(tmp, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p, ctypes.c_int]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.rle_area.restype = ctypes.c_double
    lib.rle_area.argtypes = [u32p, ctypes.c_int]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int, ctypes.c_int]
    lib.rle_merge_union.restype = ctypes.c_int
    lib.rle_merge_union.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                    u32p, ctypes.c_int]
    lib.rle_to_bbox.restype = None
    lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int, f64p]
    lib.bbox_iou.restype = None
    lib.bbox_iou.argtypes = [f64p, ctypes.c_int, f64p, ctypes.c_int, u8p, f64p]
    lib.rle_from_poly.restype = ctypes.c_int
    lib.rle_from_poly.argtypes = [f64p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, u32p, ctypes.c_int]
    return lib


_LIB = _build_library()


class RLE:
    """A single RLE mask: canvas (h, w) + uint32 run lengths (starts at 0s)."""

    __slots__ = ("h", "w", "counts")

    def __init__(self, h: int, w: int, counts: np.ndarray):
        self.h = int(h)
        self.w = int(w)
        self.counts = np.ascontiguousarray(counts, dtype=np.uint32)

    # -- constructors ---------------------------------------------------
    @staticmethod
    def encode(mask: np.ndarray) -> "RLE":
        """Binary mask [h, w] (row-major input; stored column-major)."""
        h, w = mask.shape
        col = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
        col = np.ascontiguousarray(col)
        if _LIB is not None:
            out = np.empty(_MAX_COUNTS, np.uint32)
            m = _LIB.rle_encode(
                col.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                _MAX_COUNTS)
            assert m > 0
            return RLE(h, w, out[:m].copy())
        # numpy fallback
        diffs = np.flatnonzero(col[1:] != col[:-1]) + 1
        bounds = np.concatenate([[0], diffs, [col.size]])
        runs = np.diff(bounds)
        if col[0] == 1:
            runs = np.concatenate([[0], runs])
        return RLE(h, w, runs.astype(np.uint32))

    @staticmethod
    def from_poly(poly: Sequence[float], h: int, w: int) -> "RLE":
        xy = np.ascontiguousarray(poly, dtype=np.float64)
        k = xy.size // 2
        if _LIB is not None:
            out = np.empty(_MAX_COUNTS, np.uint32)
            m = _LIB.rle_from_poly(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k, h, w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                _MAX_COUNTS)
            assert m > 0
            return RLE(h, w, out[:m].copy())
        # fallback (no compiled library): pure-numpy even-odd ray casting on
        # a 5x supersampled grid, then any-pooled per pixel — approximates
        # maskApi's boundary-inclusive 5x-upsampled rasterization
        # (maskApi.c rleFrPoly) without external dependencies
        s = 5
        v = xy.reshape(-1, 2)
        px = (np.arange(s * w, dtype=np.float64) + 0.5) / s
        py = (np.arange(s * h, dtype=np.float64) + 0.5) / s
        x0, y0 = v[:, 0], v[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        inside = np.zeros((s * h, s * w), bool)
        for e in range(len(x0)):
            if y0[e] == y1[e]:
                continue  # horizontal edge: never crosses a horizontal ray
            crosses = (y0[e] <= py) != (y1[e] <= py)            # [s*h]
            xint = x0[e] + (py - y0[e]) * (x1[e] - x0[e]) / (y1[e] - y0[e])
            inside ^= crosses[:, None] & (px[None, :] < xint[:, None])
        mask = inside.reshape(h, s, w, s).any(axis=(1, 3))
        return RLE.encode(mask)

    @staticmethod
    def from_coco(obj, h: int, w: int) -> "RLE":
        """From a COCO segmentation: polygon list, uncompressed dict, or
        compressed string."""
        if isinstance(obj, list):
            rles = [RLE.from_poly(p, h, w) for p in obj]
            return RLE.merge(rles)
        counts = obj["counts"] if isinstance(obj, dict) else obj
        hh, ww = (obj.get("size", [h, w]) if isinstance(obj, dict) else [h, w])
        if isinstance(counts, (bytes, str)):
            return RLE(hh, ww, _string_to_counts(counts))
        return RLE(hh, ww, np.asarray(counts, np.uint32))

    @staticmethod
    def merge(rles: List["RLE"]) -> "RLE":
        """Union of masks (multi-polygon instances)."""
        assert rles
        acc = rles[0]
        for r in rles[1:]:
            if _LIB is not None:
                out = np.empty(_MAX_COUNTS, np.uint32)
                m = _LIB.rle_merge_union(
                    acc.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    len(acc.counts),
                    r.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    len(r.counts),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    _MAX_COUNTS)
                assert m > 0
                acc = RLE(acc.h, acc.w, out[:m].copy())
            else:
                acc = RLE.encode(acc.decode() | r.decode())
        return acc

    # -- ops ------------------------------------------------------------
    def decode(self) -> np.ndarray:
        if _LIB is not None:
            out = np.zeros(self.h * self.w, np.uint8)
            _LIB.rle_decode(
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(self.counts), self.h, self.w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return out.reshape((self.h, self.w), order="F")
        flat = np.zeros(self.h * self.w, np.uint8)
        pos, v = 0, 0
        for run in self.counts:
            flat[pos:pos + int(run)] = v
            pos += int(run)
            v = 1 - v
        return flat.reshape((self.h, self.w), order="F")

    def area(self) -> float:
        if _LIB is not None:
            return _LIB.rle_area(
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(self.counts))
        return float(self.counts[1::2].sum())

    def iou(self, other: "RLE", iscrowd: bool = False) -> float:
        if _LIB is not None:
            return _LIB.rle_iou(
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(self.counts),
                other.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(other.counts), int(iscrowd))
        a, b = self.decode().astype(bool), other.decode().astype(bool)
        inter = float((a & b).sum())
        union = float(a.sum()) if iscrowd else float((a | b).sum())
        return inter / union if union > 0 else 0.0

    def bbox(self) -> np.ndarray:
        """(x, y, w, h)."""
        if _LIB is not None:
            out = np.zeros(4, np.float64)
            _LIB.rle_to_bbox(
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(self.counts), self.h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return out
        m = self.decode()
        ys, xs = np.where(m)
        if len(xs) == 0:
            return np.zeros(4)
        return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                         ys.max() - ys.min() + 1], np.float64)

    def to_coco(self) -> dict:
        return {"size": [self.h, self.w], "counts": _counts_to_string(self.counts)}


# ---------------------------------------------------------------------------
# COCO compressed-counts string codec (LEB128-style with delta coding)
# ---------------------------------------------------------------------------
def _counts_to_string(counts: np.ndarray) -> str:
    out = []
    for i, c in enumerate(counts.tolist()):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            cc = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (cc & 0x10)) or (x == -1 and (cc & 0x10)))
            if more:
                cc |= 0x20
            out.append(chr(cc + 48))
    return "".join(out)


def _string_to_counts(s: Union[str, bytes]) -> np.ndarray:
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def bbox_iou_matrix(dt: np.ndarray, gt: np.ndarray,
                    iscrowd: np.ndarray) -> np.ndarray:
    """xywh box IoU matrix [m, n] with the COCO crowd convention."""
    dt = np.ascontiguousarray(dt, np.float64).reshape(-1, 4)
    gt = np.ascontiguousarray(gt, np.float64).reshape(-1, 4)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    m, n = len(dt), len(gt)
    if m == 0 or n == 0:
        return np.zeros((m, n))
    if _LIB is not None:
        out = np.zeros(m * n, np.float64)
        _LIB.bbox_iou(
            dt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            iscrowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out.reshape(m, n)
    out = np.zeros((m, n))
    for j in range(n):
        gx, gy, gw, gh = gt[j]
        ga = gw * gh
        ix = np.minimum(dt[:, 0] + dt[:, 2], gx + gw) - np.maximum(dt[:, 0], gx)
        iy = np.minimum(dt[:, 1] + dt[:, 3], gy + gh) - np.maximum(dt[:, 1], gy)
        inter = np.clip(ix, 0, None) * np.clip(iy, 0, None)
        da = dt[:, 2] * dt[:, 3]
        union = da if iscrowd[j] else da + ga - inter
        out[:, j] = np.where(union > 0, inter / union, 0.0)
    return out
