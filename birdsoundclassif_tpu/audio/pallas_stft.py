"""Fused STFT front-end as a Pallas TPU kernel.

One kernel program per frame block. The hop-sized signal segments arrive
pre-shaped (n_seg, bf, hop) — framing a hop-132 signal inside the kernel
needs lane-misaligned reshapes Mosaic cannot lower — and the windowed DFT
is computed as a segment-decomposed matmul:

    frames @ M  ==  sum_s  seg_s @ M[s*hop:(s+1)*hop, :]

with M zero-padded to n_seg*hop rows so every segment is uniform. The
|.| -> amp_to_db -> band-crop -> masked min/max epilogue stays in VMEM; the
full 663-bin spectrum and the framed matrix never touch HBM.

Numerics are identical to the XLA path (same DFT matrix, f32 accumulation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import _hann_rdft_matrix


def _padded_dft(n_fft: int, hop: int) -> np.ndarray:
    """DFT matrix zero-padded to n_seg*hop rows (extra rows multiply the
    segment columns beyond the true frame length — contributions vanish)."""
    m = _hann_rdft_matrix(n_fft)
    n_seg = -(-n_fft // hop)
    out = np.zeros((n_seg * hop, m.shape[1]), np.float32)
    out[:n_fft] = m
    return out


def _make_kernel(bf: int, hop: int, n_fft: int, low_idx: int, high_idx: int,
                 db_floor: float, inv_scale: float):
    n_seg = -(-n_fft // hop)
    n_bins = n_fft // 2 + 1
    h_pix = high_idx - low_idx
    min_level = float(np.exp(db_floor / 20.0 * np.log(10.0)))

    def kernel(n_frames_ref, seg_ref, dft_ref, db_ref, mn_ref, mx_ref):
        # seg_ref block: (1, n_seg, bf, hop); dft_ref: (n_seg*hop, 2*n_bins)
        spec = jnp.zeros((bf, 2 * n_bins), jnp.float32)
        for s in range(n_seg):
            seg = seg_ref[0, s, :, :].astype(jnp.float32) * inv_scale
            spec = spec + jnp.dot(
                seg, dft_ref[s * hop:(s + 1) * hop, :],
                preferred_element_type=jnp.float32,
            )
        re, im = spec[:, :n_bins], spec[:, n_bins:]
        mag = jnp.sqrt(re * re + im * im)
        db = 20.0 * jnp.log10(jnp.maximum(min_level, mag))
        crop = db[:, low_idx:high_idx]                      # (bf, h_pix)
        db_ref[0, :, :] = crop.T                            # (h_pix, bf)
        # masked min/max over live frames of this block
        i_blk = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bf, h_pix), 0)
        live = rows + i_blk * bf < n_frames_ref[0]
        mn_ref[0, 0, 0] = jnp.min(jnp.where(live, crop, jnp.inf))
        mx_ref[0, 0, 0] = jnp.max(jnp.where(live, crop, -jnp.inf))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "bf", "hop", "n_fft", "low_idx", "high_idx",
                     "db_floor", "inv_scale", "interpret"),
)
def stft_db_pallas(
    padded: jnp.ndarray,      # (n_blocks*bf*hop + 2*(n_fft//2),) signal
    n_frames_real: jnp.ndarray,  # () int32
    n_blocks: int,
    bf: int,
    hop: int,
    n_fft: int,
    low_idx: int,
    high_idx: int,
    db_floor: float,
    inv_scale: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (db (h_pix, n_blocks*bf), gmin, gmax). Columns >= n_frames_real
    hold garbage (masked out of min/max), matching the XLA path's contract."""
    h_pix = high_idx - low_idx
    n_seg = -(-n_fft // hop)
    n_bins = n_fft // 2 + 1
    dft = jnp.asarray(_padded_dft(n_fft, hop))
    # pre-shape the hop-sized segments: one slice+reshape per segment
    need = n_blocks * bf * hop
    segs = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(padded, s * hop, need)
            .reshape(n_blocks, bf, hop)
            for s in range(n_seg)
        ],
        axis=1,
    )  # (n_blocks, n_seg, bf, hop)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, n_seg, bf, hop), lambda i, nf: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg * hop, 2 * n_bins), lambda i, nf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h_pix, bf), lambda i, nf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, nf: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, nf: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
    )
    db, mns, mxs = pl.pallas_call(
        _make_kernel(bf, hop, n_fft, low_idx, high_idx, db_floor, inv_scale),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, h_pix, bf), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_frames_real.reshape(1).astype(jnp.int32), segs, dft)
    db_full = jnp.transpose(db, (1, 0, 2)).reshape(h_pix, n_blocks * bf)
    return db_full, mns.min(), mxs.max()
