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
_build_attempted = False


def _try_build() -> None:
    """Best-effort one-time build when the .so is absent but g++ exists.

    The .so is not checked in, so a fresh checkout (or a wiped build dir)
    silently drops to the numpy fallbacks — measured at 4x slower wire-codec
    encode, enough to make the whole-file sweep prefetch-bound instead of
    device-bound (docs/BENCH.md r3 sweep attribution). Building takes ~2 s
    once; failures (no compiler, read-only tree) leave the fallback path.
    """
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        from . import build as _build
        if os.path.exists(_build.SRC) and os.access(
                os.path.dirname(_LIB_PATH), os.W_OK):
            _build.build(verbose=False)
    except Exception:
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
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
    # wire-codec entry points (absent in libraries built before they existed)
    if hasattr(lib, "nbm_wire_analyze"):
        lib.nbm_wire_analyze.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nbm_wire_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.nbm_wire_pack.restype = ctypes.c_int64
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


def wire_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "nbm_wire_analyze")


def wire_analyze(x: np.ndarray, outlier_cap: int) -> Optional[Tuple[int, int]]:
    """(k, n_outliers) for the PCM wire codec, or None without the lib."""
    if not wire_available():
        return None
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    k = ctypes.c_int32()
    n_out = ctypes.c_int64()
    lib.nbm_wire_analyze(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.size,
        outlier_cap, ctypes.byref(k), ctypes.byref(n_out),
    )
    return int(k.value), int(n_out.value)


def wire_pack(
    x: np.ndarray, k: int, outlier_cap: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """(plane-major payload, outlier_pos, outlier_res, n_outliers) or None
    (no lib, or the forced k overflows the outlier table)."""
    if not wire_available():
        return None
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    g = 8 // int(np.gcd(k, 8))
    n_groups = -(-max(x.size, 1) // g)
    payload = np.zeros((g * k // 8, n_groups), np.uint8)
    opos = np.zeros(outlier_cap, np.int32)
    ores = np.zeros(outlier_cap, np.int32)
    n_out = lib.nbm_wire_pack(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.size, k,
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_groups,
        opos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ores.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        outlier_cap,
    )
    if n_out < 0:
        return None
    return payload, opos, ores, int(n_out)


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
