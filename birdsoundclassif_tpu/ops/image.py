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
def _two_tap_blend_coeffs(in_size: int, out_size: int):
    """Coefficients for the gather-free 2-tap upsample formulation.

    align_corners bilinear output o reads input rows lo[o], lo[o]+1. When
    out_size is ~2x in_size (exactly 2*in or 2*in-1 — every transition in
    the NBM pyramids), both taps of every output row lie in
    {floor(o/2)-1, floor(o/2), floor(o/2)+1}, i.e. in the 2x-repeated
    signal z[j] = x[floor(j/2)] at offsets {o-2, o, o+2}. The resize then
    becomes   y[o] = c[0,o]*z[o-2] + c[1,o]*z[o] + c[2,o]*z[o+2]
    — repeat + shifted slices + per-row coefficients, pure elementwise XLA
    (one loop fusion, ~bandwidth cost) instead of a 99%-zero dense matmul.

    Returns (3, out_size) float32, or None when the support condition does
    not hold (generic ratios fall back to the interpolation matrices).
    """
    if in_size <= 1 or out_size <= 1 or out_size == in_size:
        return None
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    coeffs = np.zeros((3, out_size), np.float32)
    for o in range(out_size):
        reachable = {}
        for ci, off in enumerate((-2, 0, 2)):
            j = o + off
            if 0 <= j < 2 * in_size:
                reachable[j // 2] = ci
        for idx, wt in ((int(lo[o]), 1.0 - w_hi[o]), (int(hi[o]), float(w_hi[o]))):
            if wt == 0.0:
                continue
            if idx not in reachable:
                return None
            coeffs[reachable[idx], o] += wt
    return coeffs


def _blend_axis(y: jnp.ndarray, coeffs: np.ndarray, axis: int, param_dtype) -> jnp.ndarray:
    """Apply the 2-tap blend along `axis` of f32 tensor y. Coefficients are
    rounded through param_dtype first so the products match the matmul
    path's (dtype-cast matrix) x (dtype input) -> f32 MXU accumulation
    bitwise."""
    axis = axis % y.ndim
    out_size = coeffs.shape[1]
    z = jnp.repeat(y, 2, axis=axis)
    pad = [(0, 0)] * y.ndim
    pad[axis] = (2, 2)
    z = jnp.pad(z, pad)

    def sl(start: int) -> jnp.ndarray:
        idx = [slice(None)] * y.ndim
        idx[axis] = slice(start, start + out_size)
        return z[tuple(idx)]

    cshape = [1] * y.ndim
    cshape[axis] = out_size
    cm, c0, cp = (
        jnp.asarray(c).astype(param_dtype).astype(jnp.float32).reshape(cshape)
        for c in coeffs
    )
    return cm * sl(0) + c0 * sl(2) + cp * sl(4)


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

    ~2x upsamples (out = 2*in or 2*in-1 per axis — every FPN/BiFPN/attention
    transition in this model) take the gather-free 2-tap elementwise path
    (see `_two_tap_blend_coeffs`): repeat + shifted slices + coefficient
    blends, which XLA fuses into one ~bandwidth-cost loop (the dense-matrix
    formulation burned 18.8 ms/batch of 99%-zero MXU work in the flagship
    FPN; this path's floor is ~9 ms). Products match the matmul path
    bitwise (coefficients rounded through x.dtype, f32 accumulation).

    Generic ratios fall back to interpolation matrices applied per axis as
    matmuls in the input dtype (bf16 rides the MXU; f32 stays exact for
    parity tests). Spatial gathers were measured far slower than dense
    matmuls on v5e, so no gathers anywhere — with the matmul axis order
    chosen to minimize FLOPs (enlarge the cheap axis last: W-first when
    upsampling roughly halves the big contraction)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    ch = None if h == out_h else _two_tap_blend_coeffs(h, out_h)
    cw = None if w == out_w else _two_tap_blend_coeffs(w, out_w)
    if (h == out_h or ch is not None) and (w == out_w or cw is not None):
        y = x.astype(jnp.float32)
        if ch is not None:
            y = _blend_axis(y, ch, -3, x.dtype)
        if cw is not None:
            y = _blend_axis(y, cw, -2, x.dtype)
        return y.astype(x.dtype)
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
