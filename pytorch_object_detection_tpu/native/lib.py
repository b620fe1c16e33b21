"""ctypes bindings for the native detection runtime (libdetops.so).

Auto-builds on first use when g++ is available; callers must treat
``get_lib() is None`` as "use the numpy fallback".
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdetops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            from pytorch_object_detection_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.voc_match.argtypes = [_f32p, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_float, _u8p]
    lib.coco_match.argtypes = [
        _f32p, _u8p, _u8p, ctypes.c_int,
        _f32p, _u8p, ctypes.c_int,
        _f32p, ctypes.c_int,
        _u8p, _u8p,
    ]
    lib.nms_cpu.argtypes = [_f32p, _u8p, ctypes.c_int, ctypes.c_float, _u8p]
    lib.jpeg_peek.argtypes = [_u8p, ctypes.c_size_t, _i32p]
    lib.jpeg_peek.restype = ctypes.c_int
    lib.jpeg_decode_tile.argtypes = [
        _u8p, ctypes.c_size_t, _u8p, ctypes.c_int, ctypes.c_int, _i32p,
    ]
    lib.jpeg_decode_tile.restype = ctypes.c_int
    lib.jpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, _u8p, ctypes.c_int, ctypes.c_int, _i32p,
        ctypes.c_int, _i32p,
    ]
    lib.native_abi_version.restype = ctypes.c_int
    assert lib.native_abi_version() == 3
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def get_lib() -> Optional[ctypes.CDLL]:
    return _load()


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def voc_match_native(gt_boxes: np.ndarray, pred_boxes: np.ndarray, iou_threshold: float) -> np.ndarray:
    """tp flags for score-sorted predictions of one (image, class)."""
    lib = _load()
    gt = np.ascontiguousarray(gt_boxes, np.float32)
    pred = np.ascontiguousarray(pred_boxes, np.float32)
    tp = np.zeros(len(pred), np.uint8)
    lib.voc_match(_fptr(gt), len(gt), _fptr(pred), len(pred), ctypes.c_float(iou_threshold), _u8ptr(tp))
    return tp.astype(bool)


def coco_match_native(
    gt_boxes: np.ndarray,
    gt_ignore: np.ndarray,
    det_boxes: np.ndarray,
    det_out: np.ndarray,
    thresholds: np.ndarray,
    gt_crowd: Optional[np.ndarray] = None,
):
    lib = _load()
    gt = np.ascontiguousarray(gt_boxes, np.float32)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    if gt_crowd is None:
        gt_crowd = np.zeros(len(gt), np.uint8)
    gc = np.ascontiguousarray(gt_crowd, np.uint8)
    det = np.ascontiguousarray(det_boxes, np.float32)
    do = np.ascontiguousarray(det_out, np.uint8)
    thr = np.ascontiguousarray(thresholds, np.float32)
    t, d = len(thr), len(det)
    matched = np.zeros((t, d), np.uint8)
    ignored = np.zeros((t, d), np.uint8)
    lib.coco_match(
        _fptr(gt), _u8ptr(gi), _u8ptr(gc), len(gt), _fptr(det), _u8ptr(do), d,
        _fptr(thr), t, _u8ptr(matched), _u8ptr(ignored),
    )
    return matched.astype(bool), ignored.astype(bool)


def nms_cpu_native(boxes: np.ndarray, valid: np.ndarray, iou_threshold: float) -> np.ndarray:
    lib = _load()
    b = np.ascontiguousarray(boxes, np.float32)
    v = np.ascontiguousarray(valid, np.uint8)
    keep = np.zeros(len(b), np.uint8)
    lib.nms_cpu(_fptr(b), _u8ptr(v), len(b), ctypes.c_float(iou_threshold), _u8ptr(keep))
    return keep.astype(bool)


# ---------------------------------------------------------------------------
# native JPEG loader (jpeg_loader.cpp) — PIL is the fallback for anything
# the native path declines (CMYK, corrupt streams, non-JPEG files)
# ---------------------------------------------------------------------------
def _as_bytes(data) -> bytes:
    if isinstance(data, (bytes, bytearray)):
        return bytes(data)
    with open(data, "rb") as f:  # path-like
        return f.read()


def jpeg_decode_native(data) -> Optional[np.ndarray]:
    """Full-size RGB decode of one JPEG (bytes or path). None -> fall back."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(_as_bytes(data), np.uint8)
    hw = np.zeros(2, np.int32)
    if lib.jpeg_peek(_u8ptr(buf), buf.size, hw.ctypes.data_as(_i32p)) != 0:
        return None
    h, w = int(hw[0]), int(hw[1])
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.jpeg_decode_tile(_u8ptr(buf), buf.size, _u8ptr(out), h, w,
                              hw.ctypes.data_as(_i32p))
    return out if rc == 0 else None


def jpeg_decode_tile_native(data, tile_hw) -> Optional[tuple]:
    """Decode one JPEG straight into a fixed uint8 tile.

    Semantics match ``data.pipeline.decode_to_tile`` (content top-left,
    one replicated edge row/col, oversize content cropped to the tile).
    Returns (tile [th,tw,3] u8, (h, w)) or None -> fall back to PIL.
    """
    lib = _load()
    if lib is None:
        return None
    th, tw = tile_hw
    buf = np.frombuffer(_as_bytes(data), np.uint8)
    tile = np.empty((th, tw, 3), np.uint8)
    hw = np.zeros(2, np.int32)
    rc = lib.jpeg_decode_tile(_u8ptr(buf), buf.size, _u8ptr(tile), th, tw,
                              hw.ctypes.data_as(_i32p))
    if rc != 0:
        return None
    return tile, (int(hw[0]), int(hw[1]))


def jpeg_decode_batch_native(datas, tile_hw, n_threads: int = 0,
                             out_tiles: Optional[np.ndarray] = None,
                             out_hw: Optional[np.ndarray] = None):
    """Threaded batch decode into one contiguous [N,th,tw,3] u8 array.

    The GIL is released for the whole batch (one ctypes call into the
    C++ thread pool). Returns (tiles, hw [N,2] i32, ok [N] bool); failed
    images have ok=False and an undefined tile — the caller re-decodes
    those through the PIL fallback.

    ``out_tiles``/``out_hw``: preallocated destination buffers (ring-buffer
    reuse — a fresh [128,512,512,3] allocation costs ~200 MB of first-touch
    page faults per call, see scripts/bench_jpeg.py).  Must be C-contiguous
    with the exact shapes/dtypes above.
    """
    lib = _load()
    if lib is None:
        return None
    th, tw = tile_hw
    bufs = [np.frombuffer(_as_bytes(d), np.uint8) for d in datas]
    n = len(bufs)
    if out_tiles is None:
        tiles = np.empty((n, th, tw, 3), np.uint8)
    else:
        assert out_tiles.shape == (n, th, tw, 3) and out_tiles.dtype == np.uint8
        assert out_tiles.flags["C_CONTIGUOUS"]
        tiles = out_tiles
    if out_hw is None:
        hw = np.zeros((n, 2), np.int32)
    else:
        assert out_hw.shape == (n, 2) and out_hw.dtype == np.int32
        hw = out_hw
    status = np.zeros(n, np.int32)
    ptrs = (ctypes.c_void_p * n)(*[b.ctypes.data for b in bufs])
    lens = (ctypes.c_size_t * n)(*[b.size for b in bufs])
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.jpeg_decode_batch(
        ptrs, lens, n, _u8ptr(tiles), th, tw, hw.ctypes.data_as(_i32p),
        n_threads, status.ctypes.data_as(_i32p),
    )
    return tiles, hw, status == 0
