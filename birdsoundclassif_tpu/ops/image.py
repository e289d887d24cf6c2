"""Image resampling ops as separable matmuls (MXU-friendly), NHWC layout.

XLA's `jax.image.resize` uses half-pixel sampling; the reference relies on
torch's `align_corners=True` bilinear interpolation and `AdaptiveAvgPool2d`
(reference: layers.py:36-37,67,439; fpn.py:41,143; self_attention.py:33-35).
Both are exactly expressible as fixed interpolation matrices applied per
axis, which keeps them on the MXU and makes them trivially differentiable.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _bilinear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation matrix for align_corners=True."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        a[0, 0] = 1.0
        return a
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(a, (rows, lo), 1.0 - w_hi)
    np.add.at(a, (rows, hi), w_hi)
    return a


@lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching torch AdaptiveAvgPool:
    bin i covers [floor(i*I/O), ceil((i+1)*I/O)) — bins may overlap."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        a[i, start:end] = 1.0 / (end - start)
    return a


def _apply_separable(x: jnp.ndarray, mat_h: np.ndarray, mat_w: np.ndarray) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., H2, W2, C) via per-axis matmuls."""
    dtype = x.dtype
    ah = jnp.asarray(mat_h, dtype=jnp.float32)
    aw = jnp.asarray(mat_w, dtype=jnp.float32)
    y = jnp.einsum("oh,...hwc->...owc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,...hwc->...hpc", aw, y)
    return y.astype(dtype)


@lru_cache(maxsize=None)
def _lerp_indices(in_size: int, out_size: int):
    """(lo, hi, w_hi) arrays for align_corners=True sampling."""
    if out_size == 1:
        return (np.zeros(1, np.int32), np.zeros(1, np.int32), np.zeros(1, np.float32))
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    return lo, hi, (src - lo).astype(np.float32)


def _lerp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int) -> jnp.ndarray:
    lo, hi, w_hi = _lerp_indices(in_size, out_size)
    xl = jnp.take(x, jnp.asarray(lo), axis=axis)
    xh = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = jnp.asarray(w_hi).reshape(shape)
    y = xl.astype(jnp.float32) * (1.0 - t) + xh.astype(jnp.float32) * t
    return y.astype(x.dtype)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True, NHWC.

    Implemented as two-point gather + lerp per axis (VPU, bandwidth-bound)
    rather than dense interpolation matmuls: the matrices are 2-sparse, and
    a dense (512, 256) W-upsample in the FPN costs ~2.4 TFLOP at batch 32 —
    87 ms of pure waste measured on v5e."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    y = x if h == out_h else _lerp_axis(x, x.ndim - 3, h, out_h)
    return y if w == out_w else _lerp_axis(y, y.ndim - 2, w, out_w)


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch-exact AdaptiveAvgPool2d, NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _adaptive_avg_matrix(h, out_h), _adaptive_avg_matrix(w, out_w))
