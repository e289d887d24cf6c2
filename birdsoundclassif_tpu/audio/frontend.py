"""TPU-native spectrogram front-end.

Replaces the reference's host-side librosa pipeline (reference:
prepare_dataset.py:108-294) with an on-device design:

  * STFT = framing (cheap strided slices, no gather) followed by one
    hann-folded real-DFT **matmul** that runs on the MXU. n_fft = 1324 is not
    a friendly FFT size; an explicit (1324 x 1326) DFT matrix is exact,
    batched, and fast (a 1-hour file costs ~4 TFLOP — milliseconds on v5e).
  * |.| -> amp_to_db -> band-crop fused by XLA into the matmul epilogue.
  * The file-global min-max normalization is a two-pass reduction over
    chunk results (reference computes per-5e7-sample chunks and normalizes
    jointly: prepare_dataset.py:233-252).
  * Window tiling (1024 px, hop 819, reflect-padded tail) is pure index
    math on the host + one device gather (reference: split_power_spec,
    prepare_dataset.py:255-294 — including its stepwise reflect-pad loop,
    reproduced on index vectors instead of data).

Everything between "PCM samples" and "(n_windows, 375, 1024) normalized
image batch" has fixed shapes per block and compiles once.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig


# ---------------------------------------------------------------------------
# static DFT machinery
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _hann_periodic(n: int) -> np.ndarray:
    """Periodic hann window, scipy.signal.get_window('hann', n, fftbins=True)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


@lru_cache(maxsize=None)
def _hann_rdft_matrix(n_fft: int) -> np.ndarray:
    """(n_fft, 2 * n_bins) matrix computing the windowed real DFT.

    frames @ M -> [real bins | imag bins]. Built in float64, stored float32.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    w = _hann_periodic(n_fft)[:, None]
    m = np.concatenate([np.cos(ang) * w, np.sin(ang) * w], axis=1)
    return m.astype(np.float32)


def amp_to_db(x: jnp.ndarray, min_level_db: float = -100.0) -> jnp.ndarray:
    """20 * log10(max(min_level, x)) (reference: prepare_dataset.py:228-230)."""
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def _frame_block(padded: jnp.ndarray, n_frames: int, hop: int, win: int) -> jnp.ndarray:
    """(n_frames, win) overlapping frames from a 1-D padded block.

    Uses ceil(win/hop) contiguous strided reshapes + one concat — pure layout
    ops that XLA fuses, avoiding a 10M-element gather.
    """
    n_seg = -(-win // hop)  # ceil
    # input must be (n_frames + n_seg - 1) * hop long so every strided
    # segment slice is in bounds (dynamic_slice clamps silently otherwise)
    segs = []
    for s in range(n_seg):
        start = s * hop
        seg = jax.lax.dynamic_slice_in_dim(padded, start, n_frames * hop)
        segs.append(seg.reshape(n_frames, hop))
    return jnp.concatenate(segs, axis=1)[:, :win]


def frame_block_input_len(n_frames: int, hop: int, win: int) -> int:
    n_seg = -(-win // hop)
    return (n_frames + n_seg - 1) * hop


@partial(jax.jit, static_argnames=("n_frames", "hop", "n_fft", "low_idx", "high_idx", "db_floor"))
def _stft_db_block(
    padded: jnp.ndarray,
    n_frames: int,
    hop: int,
    n_fft: int,
    low_idx: int,
    high_idx: int,
    db_floor: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One block of frames -> (dB rows (h_pix, n_frames), block min, block max)."""
    frames = _frame_block(padded, n_frames, hop, n_fft)
    m = jnp.asarray(_hann_rdft_matrix(n_fft))
    n_bins = n_fft // 2 + 1
    spec = frames @ m  # (n_frames, 2*n_bins) — MXU
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im)
    db = amp_to_db(mag, db_floor)
    crop = db[:, low_idx:high_idx].T  # (h_pix, n_frames)
    return crop, crop.min(), crop.max()


# ---------------------------------------------------------------------------
# window split index math (host, exact reference semantics)
# ---------------------------------------------------------------------------


def num_windows(total_frames: int, w_pix: int, hop_spectro: int) -> int:
    """reference: split_power_spec count (prepare_dataset.py:267)."""
    return max(1, int(1 + np.ceil((total_frames - w_pix) / hop_spectro)))


def window_column_indices(
    total_frames: int,
    w_pix: int,
    hop_spectro: int,
    empty_width: Optional[int] = None,
) -> np.ndarray:
    """(n_windows, w_pix) int32 column indices into the full spectrogram.

    The short tail window is grown by the reference's stepwise reflect-pad
    loop (prepare_dataset.py:280-292), applied here to an index vector —
    reflecting indices is identical to reflecting data.

    empty_width: the loop's initial pad budget; defaults to w_pix as in the
    label-free (inference) path where max_pix = total - w_pix.
    """
    n_win = num_windows(total_frames, w_pix, hop_spectro)
    rows = []
    for k in range(n_win):
        start = k * hop_spectro
        end = min(start + w_pix, total_frames)
        idx = np.arange(start, end, dtype=np.int64)
        rows.append(idx)
    last = rows[-1]
    if last.size < w_pix:
        ew = w_pix if empty_width is None else int(empty_width)
        while last.size < w_pix:
            pad = max(1, min(ew, w_pix - last.size))
            last = np.pad(last, (0, pad), mode="reflect")
            ew += pad
        rows[-1] = last
    return np.stack(rows).astype(np.int32)


# ---------------------------------------------------------------------------
# front-end driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FrontendResult:
    """Normalized spectrogram + window tiling of one audio file."""

    spec: jnp.ndarray          # (h_pix, total_frames) float32 in [0, 1]
    window_cols: np.ndarray    # (n_windows, w_pix) int32
    total_frames: int          # == reference File_Processor.spectrogram_length
    s_min: float
    s_max: float

    @property
    def n_windows(self) -> int:
        return self.window_cols.shape[0]

    def windows(self) -> jnp.ndarray:
        """(n_windows, h_pix, w_pix) batch, gathered on device."""
        return jnp.take(self.spec, jnp.asarray(self.window_cols), axis=1).transpose(1, 0, 2)


class SpectrogramFrontend:
    """wav samples -> normalized spectrogram windows, on device.

    block_frames bounds per-step memory: each jit step processes a fixed
    number of STFT frames (compiled once, reused across files and blocks).
    """

    def __init__(self, cfg: FrontendConfig | None = None, block_frames: int = 65536):
        self.cfg = cfg or FrontendConfig()
        self.block_frames = block_frames

    def _chunk_spans(self, n_samples: int) -> List[Tuple[int, int]]:
        """reference STFT chunking: range(int(len/5e7) + 1) slices
        (prepare_dataset.py:234-237); empty trailing chunk skipped."""
        max_l = self.cfg.stft_chunk_samples
        spans = []
        for k in range(int(n_samples / max_l) + 1):
            s, e = k * max_l, min((k + 1) * max_l, n_samples)
            if e > s:
                spans.append((s, e))
        return spans

    def _chunk_db(self, samples: np.ndarray) -> Tuple[List[jnp.ndarray], float, float]:
        cfg = self.cfg
        hop, n_fft = cfg.hop_length, cfg.win_length
        pad = n_fft // 2
        bf = self.block_frames
        pieces: List[jnp.ndarray] = []
        gmin, gmax = np.inf, -np.inf
        n_frames_total = 1 + len(samples) // hop
        # librosa center=True, pad_mode='constant' (zeros)
        padded = np.zeros(len(samples) + 2 * pad, dtype=np.float32)
        padded[pad:pad + len(samples)] = samples
        block_in_len = frame_block_input_len(bf, hop, n_fft)
        for b0 in range(0, n_frames_total, bf):
            nb = min(bf, n_frames_total - b0)
            s = b0 * hop
            block = padded[s:s + block_in_len]
            if block.size < block_in_len:
                block = np.pad(block, (0, block_in_len - block.size))
            db, bmin, bmax = _stft_db_block(
                jnp.asarray(block), bf, hop, n_fft, cfg.low_idx, cfg.high_idx, cfg.db_floor
            )
            db = db[:, :nb]
            # block min/max must ignore padded garbage frames
            bmin = float(db.min()) if nb < bf else float(bmin)
            bmax = float(db.max()) if nb < bf else float(bmax)
            gmin, gmax = min(gmin, bmin), max(gmax, bmax)
            pieces.append(db)
        return pieces, gmin, gmax

    def process(self, samples: np.ndarray, empty_width: Optional[int] = None) -> FrontendResult:
        """Full front-end for one file's PCM samples (44.1 kHz mono float32)."""
        samples = np.asarray(samples, dtype=np.float32)
        all_pieces: List[jnp.ndarray] = []
        gmin, gmax = np.inf, -np.inf
        for (s, e) in self._chunk_spans(len(samples)):
            pieces, cmin, cmax = self._chunk_db(samples[s:e])
            all_pieces.extend(pieces)
            gmin, gmax = min(gmin, cmin), max(gmax, cmax)
        spec_db = jnp.concatenate(all_pieces, axis=1)
        denom = gmax - gmin
        if denom == 0.0:
            denom = 1.0
        spec = (spec_db - gmin) / denom
        total = spec.shape[1]
        cols = window_column_indices(
            total, self.cfg.w_pix, self.cfg.hop_spectro, empty_width=empty_width
        )
        return FrontendResult(
            spec=spec, window_cols=cols, total_frames=total, s_min=gmin, s_max=gmax
        )
