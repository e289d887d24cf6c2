"""ctypes bindings for the native library (decode / resample / NMS).

All entry points return None (or raise nothing) when the library has not
been built; callers fall back to the pure-python implementations.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libnbmnative.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nbm_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.nbm_read_wav.restype = ctypes.c_int
    lib.nbm_free.argtypes = [ctypes.c_void_p]
    lib.nbm_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    lib.nbm_resample.restype = ctypes.c_int64
    lib.nbm_nms_in_order.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """(mono float32, sample_rate) via the C++ decoder, or None."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.nbm_read_wav(path.encode(), ctypes.byref(out), ctypes.byref(n),
                          ctypes.byref(sr))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.nbm_free(out)
    return arr, int(sr.value)


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = lib.nbm_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out, ctypes.byref(out),
    )
    if n_out < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n_out,)).copy()
    finally:
        lib.nbm_free(out)
    return arr


def nms_in_order(boxes: np.ndarray, valid: np.ndarray, iou_thresh: float
                 ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    keep = np.zeros(len(boxes), np.uint8)
    lib.nbm_nms_in_order(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(boxes), iou_thresh,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
