"""Vectorized multi-level RoI pooling with positional encodings.

Replaces the reference's per-RoI Python double loop (reference:
layers.py:399-497) with indicator-matrix einsums: an adaptive-avg-pool of an
arbitrary rectangle is `row_ind @ FM @ col_ind^T` where the indicator
vectors are 0/1 masks normalized by bin size — computed for every RoI at
once and contracted on the MXU. Per-RoI level assignment is handled by
pooling against every pyramid level and selecting by a one-hot level mask
(levels are few and the einsums are tiny relative to the backbone).

Faithfully reproduced reference quirks:
  * level = clamp(trunc(log2(0.1 * sqrt(area))), 0, L-1)   (:408-409, .int()
    truncates toward zero)
  * feature coords = round(coord / stride) with y2 pre-clamped to H-1
    (:425-428, 456)
  * the while-loop growth to >= pool_h/pool_w, both ends stepped per
    iteration, x2 NOT pre-clamped (:459-465) — emulated with a fixed number
    of masked growth steps (2 suffices; 3 used)
  * torch slicing truncates x2 to W-1 for the feature patch, while the RoI
    PE slice uses the raw x2 (:480-489)
  * RoI PE: freq rows [s*y1, s*y2) of a 375-long 1-D PE, time rows
    [0, s*(x2-x1)) of a 1024-long 1-D PE, each adaptively pooled — the
    outer-sum structure makes the 2x2 pool separable, so each half pools a
    1-D table with the same indicator trick.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.posenc import one_dim_positional_encoding


def _assign_level(rois: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    """(B, R) int32 pyramid level per RoI (reference: layers.py:408-417)."""
    size = jnp.sqrt(
        jnp.maximum((rois[..., 2] - rois[..., 0]) * (rois[..., 3] - rois[..., 1]), 1e-6)
    )
    lvl = jnp.trunc(jnp.log(size * 0.1) / np.log(2.0))
    return jnp.clip(lvl, 0, n_layers - 1).astype(jnp.int32)


def _grow_to_min(lo, hi, limit, min_size, steps=3):
    """Masked emulation of: while hi - lo + 1 < min_size:
    lo = max(0, lo - 1); hi = min(limit, hi + 1)."""
    for _ in range(steps):
        need = (hi - lo + 1) < min_size
        lo = jnp.where(need, jnp.maximum(0, lo - 1), lo)
        hi = jnp.where(need, jnp.minimum(limit, hi + 1), hi)
    return lo, hi


def _adaptive_bins(length, n_bins):
    """Traced start/end (exclusive) arrays, shape (..., n_bins), matching
    torch AdaptiveAvgPool: bin i = [floor(i*L/n), ceil((i+1)*L/n))."""
    idx = jnp.arange(n_bins)
    starts = (idx * length[..., None]) // n_bins
    ends = -((-(idx + 1) * length[..., None]) // n_bins)
    return starts, ends


def _range_indicator(starts, ends, size: int):
    """(..., n_bins, size) mean-indicator rows over [start, end)."""
    r = jnp.arange(size)
    mask = (r >= starts[..., None]) & (r < ends[..., None])
    cnt = jnp.maximum(ends - starts, 1)[..., None]
    return mask.astype(jnp.float32) / cnt


def roi_pool(
    rois: jnp.ndarray,
    fpn_out: List[jnp.ndarray],
    cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """rois: (B, R, 4) absolute image coords; fpn_out: NHWC pyramid.

    Returns (roi_pool_out (B, R, ph, pw, C), roi_pe_out (B, R, ph, pw, C),
    level (B, R))."""
    n_layers = cfg.n_layers
    ph, pw = cfg.roi_pool_h, cfg.roi_pool_w
    c = cfg.out_fpn_chan
    b, r = rois.shape[:2]
    level = _assign_level(rois, n_layers)
    level_oh = jax.nn.one_hot(level, n_layers, dtype=jnp.float32)  # (B, R, L)

    pe_freq = one_dim_positional_encoding(cfg.img_height, c // 2)  # (375, C/2)
    pe_time = one_dim_positional_encoding(cfg.img_width, c // 2)   # (1024, C/2)

    pooled_acc = jnp.zeros((b, r, ph, pw, c), jnp.float32)
    pe_acc = jnp.zeros((b, r, ph, pw, c), jnp.float32)

    for l in range(n_layers):
        fm = fpn_out[l]  # keep compute dtype; f32 accumulation in the einsums
        h_l, w_l = fm.shape[1], fm.shape[2]
        s = 2 ** (l + 1)
        x1 = jnp.round(rois[..., 0] / s).astype(jnp.int32)
        y1 = jnp.round(rois[..., 1] / s).astype(jnp.int32)
        x2 = jnp.round(rois[..., 2] / s).astype(jnp.int32)
        y2 = jnp.minimum(jnp.round(rois[..., 3] / s).astype(jnp.int32), h_l - 1)
        y1, y2 = _grow_to_min(y1, y2, h_l - 1, ph)
        x1, x2 = _grow_to_min(x1, x2, w_l - 1, pw)

        # ---- feature pooling (torch slice truncates x2 at W-1) ----
        x2_eff = jnp.minimum(x2, w_l - 1)
        hs, he = _adaptive_bins(y2 - y1 + 1, ph)
        ws, we = _adaptive_bins(x2_eff - x1 + 1, pw)
        row_ind = _range_indicator(y1[..., None] + hs, y1[..., None] + he, h_l)
        col_ind = _range_indicator(x1[..., None] + ws, x1[..., None] + we, w_l)
        # contract W first: the (B, R, pw, H, C) intermediate is W/H (~2.7x)
        # smaller than the (B, R, ph, W, C) alternative — peak-HBM critical
        pooled = jnp.einsum(
            "brjw,bhwc->brjhc", col_ind.astype(fm.dtype), fm,
            preferred_element_type=jnp.float32,
        )
        pooled = jnp.einsum(
            "brih,brjhc->brijc", row_ind, pooled.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

        # ---- RoI positional encoding (separable outer-sum) ----
        hf = s * (y2 - y1)                       # freq patch height
        wt = s * (x2 - x1)                       # time patch width (raw x2)
        fs, fe = _adaptive_bins(hf, ph)
        ts, te = _adaptive_bins(wt, pw)
        f_ind = _range_indicator(s * y1[..., None] + fs, s * y1[..., None] + fe,
                                 cfg.img_height)
        t_ind = _range_indicator(ts, te, cfg.img_width)
        pe_f = jnp.einsum("brih,hc->bric", f_ind, pe_freq,
                          preferred_element_type=jnp.float32)  # (B,R,ph,C/2)
        pe_t = jnp.einsum("brjw,wc->brjc", t_ind, pe_time,
                          preferred_element_type=jnp.float32)  # (B,R,pw,C/2)
        pe = jnp.concatenate(
            [
                jnp.broadcast_to(pe_f[:, :, :, None, :], (b, r, ph, pw, c // 2)),
                jnp.broadcast_to(pe_t[:, :, None, :, :], (b, r, ph, pw, c // 2)),
            ],
            axis=-1,
        )

        w_l_mask = level_oh[..., l][..., None, None, None]
        pooled_acc = pooled_acc + pooled * w_l_mask
        pe_acc = pe_acc + pe * w_l_mask

    return pooled_acc, pe_acc, level
