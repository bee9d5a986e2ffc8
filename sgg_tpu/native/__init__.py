"""ctypes bindings for the native (C++) host-side components.

The shared library is built on demand with ``make`` (g++); if the toolchain is
unavailable the module falls back to pure-numpy implementations with identical
semantics, so the framework stays importable everywhere. The native rasterizer
is the parity oracle for ``sgg_tpu.ops.rects`` (the reference's equivalent is
native Cython, ``/root/reference/lib/draw_rectangles``); the native packer is
the host hot loop replacing the reference's Python ``Blob`` collation
(``/root/reference/dataloaders/blob.py:128-168``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsggnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        srcs = [os.path.join(_HERE, s)
                for s in ("rects.cpp", "collate.cpp", "image_prep.cpp")]
        stale = (not os.path.exists(_LIB_PATH)) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs)
        if stale:
            try:
                subprocess.run(["make", "-s"], cwd=_HERE, check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.draw_union_rects.restype = None
        lib.draw_union_rects.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.prepare_image_u8.restype = None
        lib.prepare_image_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pack_graph_batch.restype = ctypes.c_int64
        lib.pack_graph_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def draw_union_rects_native(pair_boxes: np.ndarray, pooling_size: int) -> np.ndarray:
    """Native oracle for the box-pair rasterizer.

    pair_boxes: (N, 8) float32 -> (N, 2, P, P) float32 coverage.
    """
    lib = _load()
    pair_boxes = np.ascontiguousarray(pair_boxes, dtype=np.float32)
    n = pair_boxes.shape[0]
    out = np.empty((n, 2, pooling_size, pooling_size), dtype=np.float32)
    if lib is not None:
        lib.draw_union_rects(_ptr(pair_boxes, ctypes.c_float), n, pooling_size,
                             _ptr(out, ctypes.c_float))
        return out
    # numpy fallback with identical semantics
    P = pooling_size
    b = pair_boxes.reshape(n, 2, 4)
    x1u = b[..., 0].min(1, keepdims=True)
    y1u = b[..., 1].min(1, keepdims=True)
    x2u = b[..., 2].max(1, keepdims=True)
    y2u = b[..., 3].max(1, keepdims=True)
    w = np.where(x2u - x1u > 0, x2u - x1u, 1.0)
    h = np.where(y2u - y1u > 0, y2u - y1u, 1.0)
    x1 = (b[..., 0] - x1u) * P / w
    y1 = (b[..., 1] - y1u) * P / h
    x2 = (b[..., 2] - x1u) * P / w
    y2 = (b[..., 3] - y1u) * P / h
    j = np.arange(P, dtype=np.float32)[:, None]
    k = np.arange(P, dtype=np.float32)[None, :]
    yc = np.clip(j + 1 - y1[..., None, None], 0, 1) * np.clip(y2[..., None, None] - j, 0, 1)
    xc = np.clip(k + 1 - x1[..., None, None], 0, 1) * np.clip(x2[..., None, None] - k, 0, 1)
    return (yc * xc).astype(np.float32)


def pack_graph_batch(
    boxes: np.ndarray, classes: np.ndarray, node_offsets: np.ndarray,
    rels: np.ndarray, rel_offsets: np.ndarray, n_max: int, e_max: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Pack ragged per-image graphs into padded fixed-shape buffers.

    Returns (boxes (B,N,4) f32, classes (B,N) i32, node_mask (B,N) u8,
    rels (B,E,3) i32, rel_mask (B,E) u8, dropped_rel_count).
    """
    B = len(node_offsets) - 1
    boxes = np.ascontiguousarray(boxes, dtype=np.float32).reshape(-1, 4)
    classes = np.ascontiguousarray(classes, dtype=np.int32)
    node_offsets = np.ascontiguousarray(node_offsets, dtype=np.int64)
    rels = np.ascontiguousarray(rels, dtype=np.int32).reshape(-1, 3)
    rel_offsets = np.ascontiguousarray(rel_offsets, dtype=np.int64)

    out_boxes = np.empty((B, n_max, 4), dtype=np.float32)
    out_classes = np.empty((B, n_max), dtype=np.int32)
    out_node_mask = np.empty((B, n_max), dtype=np.uint8)
    out_rels = np.empty((B, e_max, 3), dtype=np.int32)
    out_rel_mask = np.empty((B, e_max), dtype=np.uint8)

    lib = _load()
    if lib is not None:
        dropped = lib.pack_graph_batch(
            _ptr(boxes, ctypes.c_float), _ptr(classes, ctypes.c_int32),
            _ptr(node_offsets, ctypes.c_int64), _ptr(rels, ctypes.c_int32),
            _ptr(rel_offsets, ctypes.c_int64), B, n_max, e_max,
            _ptr(out_boxes, ctypes.c_float), _ptr(out_classes, ctypes.c_int32),
            _ptr(out_node_mask, ctypes.c_uint8), _ptr(out_rels, ctypes.c_int32),
            _ptr(out_rel_mask, ctypes.c_uint8))
        return out_boxes, out_classes, out_node_mask, out_rels, out_rel_mask, int(dropped)

    # numpy fallback
    out_boxes[:] = 0
    out_classes[:] = 0
    out_node_mask[:] = 0
    out_rels[:] = 0
    out_rel_mask[:] = 0
    dropped = 0
    for b in range(B):
        ns, ne = node_offsets[b], node_offsets[b + 1]
        n = min(ne - ns, n_max)
        out_boxes[b, :n] = boxes[ns:ns + n]
        out_classes[b, :n] = classes[ns:ns + n]
        out_node_mask[b, :n] = 1
        w = 0
        for r in range(rel_offsets[b], rel_offsets[b + 1]):
            s, o, p = rels[r]
            if s >= n or o >= n or s < 0 or o < 0 or w >= e_max:
                dropped += 1
                continue
            out_rels[b, w] = (s, o, p)
            out_rel_mask[b, w] = 1
            w += 1
    return out_boxes, out_classes, out_node_mask, out_rels, out_rel_mask, dropped


def prepare_image_u8(img: np.ndarray, canvas_size: int, ch: int, cw: int,
                     flip: bool, fill) -> Optional[np.ndarray]:
    """Native one-pass image prep: PIL-style triangle (antialiased bilinear)
    resize of a (h, w, 3) uint8 image to (ch, cw), optional horizontal flip,
    written into a (S, S, 3) uint8 canvas padded with ``fill``.

    Returns None when the native library is unavailable (callers fall back
    to the PIL path with equivalent semantics)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    canvas = np.empty((canvas_size, canvas_size, 3), np.uint8)
    fill_arr = np.ascontiguousarray(fill, dtype=np.uint8)
    lib.prepare_image_u8(
        _ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
        _ptr(canvas, ctypes.c_uint8), canvas_size, ch, cw,
        1 if flip else 0, _ptr(fill_arr, ctypes.c_uint8))
    return canvas
