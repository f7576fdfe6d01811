"""Build + load the native library; numpy fallback when g++ is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libbbocr_native.so")
_SOURCES = ["cc_labeling.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False

# Max components per labeling call; generous for text masks (CRAFT score maps
# on a 1024x768 canvas rarely exceed a few hundred regions).
MAX_COMPONENTS = 8192


def _newest_mtime(paths):
    return max(os.path.getmtime(p) for p in paths)


def _build() -> str | None:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= _newest_mtime(srcs):
        return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.bbocr_label_components.restype = ctypes.c_int32
            lib.bbocr_label_components.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_void_p,  # float* score or NULL
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32,
            ]
            lib.bbocr_extract_quads.restype = ctypes.c_int32
            lib.bbocr_extract_quads.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32,
            ]
            lib.bbocr_extract_quads_masked.restype = ctypes.c_int32
            lib.bbocr_extract_quads_masked.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def connected_components(mask: np.ndarray, score: np.ndarray | None = None, connectivity: int = 8):
    """Label a binary mask; return (labels int32 HxW, stats (N, 11) float64).

    Stats columns: x0, y0, x1, y1 (inclusive bbox), count, sum_x, sum_y,
    sum_xx, sum_yy, sum_xy, max_score.
    """
    mask = np.ascontiguousarray(mask != 0, np.uint8)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        labels = np.empty((h, w), np.int32)
        stats = np.zeros((MAX_COMPONENTS, 11), np.float64)
        score_ptr = None
        score_arr = None
        if score is not None:
            score_arr = np.ascontiguousarray(score, np.float32)
            score_ptr = score_arr.ctypes.data_as(ctypes.c_void_p)
        n = lib.bbocr_label_components(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            score_ptr,
            h, w, connectivity,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            MAX_COMPONENTS,
        )
        return labels, stats[:n].copy()
    return _connected_components_numpy(mask, score, connectivity)


MAX_QUADS = 4096


def extract_quads_native(
    region: np.ndarray,
    affinity: np.ndarray,
    text_threshold: float,
    link_threshold: float,
    low_text: float,
    min_size: int,
) -> np.ndarray | None:
    """Full detection postprocessing in one C++ call.

    Returns (N, 4, 2) float64 quads (top-left first, clockwise) or None when
    the native library is unavailable (caller falls back to the numpy path).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "bbocr_extract_quads"):
        return None
    region = np.ascontiguousarray(region, np.float32)
    affinity = np.ascontiguousarray(affinity, np.float32)
    h, w = region.shape
    quads = np.empty((MAX_QUADS, 4, 2), np.float64)
    n = lib.bbocr_extract_quads(
        region.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        affinity.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w,
        float(text_threshold), float(link_threshold), float(low_text),
        int(min_size),
        quads.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        MAX_QUADS,
    )
    return quads[:n].copy()


def extract_quads_masked_native(
    mask: np.ndarray,
    score_u8: np.ndarray,
    text_threshold: float,
    min_size: int,
) -> np.ndarray | None:
    """Masked/quantized postprocessing: mask + uint8 region (score*255).

    Same output contract as :func:`extract_quads_native`; None when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "bbocr_extract_quads_masked"):
        return None
    mask = np.ascontiguousarray(mask != 0, np.uint8)
    score_u8 = np.ascontiguousarray(score_u8, np.uint8)
    h, w = mask.shape
    quads = np.empty((MAX_QUADS, 4, 2), np.float64)
    n = lib.bbocr_extract_quads_masked(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        score_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        float(text_threshold) * 255.0,
        int(min_size),
        quads.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        MAX_QUADS,
    )
    return quads[:n].copy()


def _connected_components_numpy(mask, score, connectivity):
    """Fallback: BFS labeling in numpy/python (slow, correctness-only)."""
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    stats = []
    if connectivity == 8:
        nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        nbrs = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    from collections import deque

    nid = 0
    for yy in range(h):
        for xx in range(w):
            if not mask[yy, xx] or labels[yy, xx]:
                continue
            nid += 1
            q = deque([(yy, xx)])
            labels[yy, xx] = nid
            x0 = x1 = xx
            y0 = y1 = yy
            cnt = 0
            sx = sy = sxx = syy = sxy = 0.0
            mx = 0.0
            while q:
                cy, cx = q.popleft()
                cnt += 1
                sx += cx; sy += cy
                sxx += cx * cx; syy += cy * cy; sxy += cx * cy
                x0 = min(x0, cx); x1 = max(x1, cx)
                y0 = min(y0, cy); y1 = max(y1, cy)
                if score is not None:
                    mx = max(mx, float(score[cy, cx]))
                for dy, dx in nbrs:
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not labels[ny, nx]:
                        labels[ny, nx] = nid
                        q.append((ny, nx))
            stats.append([x0, y0, x1, y1, cnt, sx, sy, sxx, syy, sxy, mx])
    return labels, np.asarray(stats, np.float64).reshape(-1, 11)
