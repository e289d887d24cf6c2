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


def _matmul_axis_h(x: jnp.ndarray, mat: np.ndarray) -> jnp.ndarray:
    a = jnp.asarray(mat).astype(x.dtype)
    return jnp.einsum("oh,...hwc->...owc", a, x)


def _matmul_axis_w(x: jnp.ndarray, mat: np.ndarray) -> jnp.ndarray:
    a = jnp.asarray(mat).astype(x.dtype)
    return jnp.einsum("pw,...hwc->...hpc", a, x)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True, NHWC.

    Interpolation matrices applied per axis as matmuls in the input dtype
    (bf16 rides the MXU; f32 stays exact for parity tests). Spatial gathers
    were measured far slower than dense matmuls on v5e, so matmul it is —
    with the axis order chosen to minimize FLOPs (enlarge the cheap axis
    last: W-first when upsampling roughly halves the big contraction)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    mh = _bilinear_matrix_align_corners(h, out_h)
    mw = _bilinear_matrix_align_corners(w, out_w)
    cost_hw = out_h * h * w + out_w * w * out_h   # H first
    cost_wh = out_w * w * h + out_h * h * out_w   # W first
    if cost_hw <= cost_wh:
        y = x if h == out_h else _matmul_axis_h(x, mh)
        return y if w == out_w else _matmul_axis_w(y, mw)
    y = x if w == out_w else _matmul_axis_w(x, mw)
    return y if h == out_h else _matmul_axis_h(y, mh)


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch-exact AdaptiveAvgPool2d, NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _adaptive_avg_matrix(h, out_h), _adaptive_avg_matrix(w, out_w))
