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

Host-link discipline (the TPU may sit behind a slow tunnel): the PCM
samples cross host->device exactly once, each 5e7-sample chunk is one
compiled dispatch (a fori_loop over frame blocks with on-device min/max
accumulation), and nothing syncs back to the host. All shapes are bucketed
so a directory sweep reuses a handful of compilations.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig

FRAME_BUCKET = 8192  # spectrogram column allocation granularity


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


def _frame_block(padded: jnp.ndarray, start: jnp.ndarray, n_frames: int, hop: int,
                 win: int) -> jnp.ndarray:
    """(n_frames, win) overlapping frames starting at `start` (traced).

    Uses ceil(win/hop) contiguous strided reshapes + one concat — pure layout
    ops that XLA fuses, avoiding a 10M-element gather.
    """
    n_seg = -(-win // hop)  # ceil
    segs = []
    for s in range(n_seg):
        seg = jax.lax.dynamic_slice_in_dim(padded, start + s * hop, n_frames * hop)
        segs.append(seg.reshape(n_frames, hop))
    return jnp.concatenate(segs, axis=1)[:, :win]


def frame_block_input_len(n_frames: int, hop: int, win: int) -> int:
    n_seg = -(-win // hop)
    return (n_frames + n_seg - 1) * hop


@partial(
    jax.jit,
    static_argnames=("n_blocks", "bf", "hop", "n_fft", "low_idx", "high_idx", "db_floor",
                     "inv_scale"),
    donate_argnums=(1,),
)
def _chunk_spectrogram(
    padded: jnp.ndarray,        # (662 + L_bucket + 662,) centered, zero-padded
    out_buf: jnp.ndarray,       # (h_pix, T_alloc) — donated, written in place
    out_offset: jnp.ndarray,    # int32: first output column of this chunk
    n_frames_real: jnp.ndarray,  # int32: live frames in this chunk
    gmin: jnp.ndarray,
    gmax: jnp.ndarray,
    n_blocks: int,
    bf: int,
    hop: int,
    n_fft: int,
    low_idx: int,
    high_idx: int,
    db_floor: float,
    inv_scale: float = 1.0,
):
    """One dispatch per chunk: fori over frame blocks, DFT matmul on the
    MXU, dB + crop, masked min/max accumulation, in-place column writes."""
    m = jnp.asarray(_hann_rdft_matrix(n_fft))
    n_bins = n_fft // 2 + 1

    def body(k, state):
        buf, mn, mx = state
        start = k * bf * hop
        frames = _frame_block(padded, start, bf, hop, n_fft)
        # int16 inputs dequantize here (value * 1/32768 == librosa PCM16)
        spec = (frames.astype(jnp.float32) * inv_scale) @ m
        re, im = spec[:, :n_bins], spec[:, n_bins:]
        mag = jnp.sqrt(re * re + im * im)
        db = amp_to_db(mag, db_floor)[:, low_idx:high_idx].T  # (h_pix, bf)
        cols = k * bf + jnp.arange(bf)
        valid = cols < n_frames_real
        mn = jnp.minimum(mn, jnp.where(valid[None, :], db, jnp.inf).min())
        mx = jnp.maximum(mx, jnp.where(valid[None, :], db, -jnp.inf).max())
        buf = jax.lax.dynamic_update_slice(buf, db, (0, out_offset + k * bf))
        return buf, mn, mx

    return jax.lax.fori_loop(0, n_blocks, body, (out_buf, gmin, gmax))


@jax.jit
def _normalize(buf: jnp.ndarray, gmin: jnp.ndarray, gmax: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.where(gmax > gmin, gmax - gmin, 1.0)
    return (buf - gmin) / denom


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

    spec_padded: jnp.ndarray   # (h_pix, T_alloc) float32 in [0, 1]; columns
                               # >= total_frames are padding
    window_cols: np.ndarray    # (n_windows, w_pix) int32
    total_frames: int          # == reference File_Processor.spectrogram_length
    s_min: jnp.ndarray         # device scalars (converted lazily)
    s_max: jnp.ndarray

    @property
    def n_windows(self) -> int:
        return self.window_cols.shape[0]

    @property
    def spec(self) -> np.ndarray:
        """Exact (h_pix, total_frames) spectrogram, materialized on host."""
        return np.asarray(self.spec_padded)[:, : self.total_frames]

    def windows(self) -> jnp.ndarray:
        """(n_windows, h_pix, w_pix) batch, gathered on device."""
        return jnp.take(self.spec_padded, jnp.asarray(self.window_cols), axis=1).transpose(
            1, 0, 2
        )


class SpectrogramFrontend:
    """wav samples -> normalized spectrogram windows, on device.

    block_frames bounds per-step VMEM/HBM: each fori step processes a fixed
    number of STFT frames (compiled once, reused across files and blocks).
    """

    def __init__(self, cfg: FrontendConfig | None = None, block_frames: int = 16384,
                 wire_codec: bool = True):
        self.cfg = cfg or FrontendConfig()
        # NOTE: a fused Pallas STFT kernel was built and chip-benched in r3
        # and LOST to this XLA path 1.5x device-side (~30 ms vs ~19 ms for
        # 600 s of audio): Mosaic cannot lower the lane-misaligned hop-132
        # framing, so the kernel needed n_seg=8 hop-shifted signal copies
        # materialized in HBM plus a final (blocks, h, bf) transpose pass,
        # while XLA fuses framing straight into the DFT matmul. Removed;
        # numbers in docs/BENCH.md ("Pallas STFT settled").
        self.block_frames = block_frames
        # lossless k-bit delta packing of int16 PCM for the host->device
        # link (audio/wirecodec.py); long files are packed one STFT chunk
        # at a time (each chunk's delta stream is self-contained)
        self.wire_codec = wire_codec

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

    def process(self, samples, empty_width: Optional[int] = None) -> FrontendResult:
        """Full front-end for one file's PCM samples (44.1 kHz mono, int16 /
        f32 array or a pre-encoded wirecodec.PackedAudio).

        One host->device transfer per 5e7-sample STFT chunk (delta-bit-
        packed when the input is int16 and wire_codec is on), one dispatch
        per chunk, one normalize dispatch; no host syncs. A pre-encoded
        PackedAudio input must fit a single chunk.
        """
        from .wirecodec import PackedAudio, encode

        cfg = self.cfg
        hop, n_fft = cfg.hop_length, cfg.win_length
        pad = n_fft // 2
        bf = self.block_frames
        packed: Optional[PackedAudio] = None
        use_codec = False
        if isinstance(samples, PackedAudio):
            packed = samples
            n_samples = packed.n_samples
            if n_samples == 0:
                raise ValueError("empty audio: nothing to process")
            if n_samples > cfg.stft_chunk_samples:
                raise ValueError("packed input must fit one STFT chunk")
            inv_scale = 1.0 / 32768.0
        else:
            samples = np.asarray(samples)
            if samples.size == 0:
                raise ValueError("empty audio: nothing to process")
            n_samples = samples.size
            if samples.dtype == np.int16:
                inv_scale = 1.0 / 32768.0  # dequantize on device (librosa PCM16)
                # long files are packed one STFT chunk at a time below
                # (each chunk's delta stream is self-contained)
                use_codec = self.wire_codec
            else:
                samples = samples.astype(np.float32, copy=False)
                inv_scale = 1.0
        spans = self._chunk_spans(n_samples)
        frames_per_chunk = [1 + (e - s) // hop for (s, e) in spans]
        total = int(sum(frames_per_chunk))
        # block writes of chunk c span [offset_c, offset_c + n_blocks_c*bf);
        # the buffer must cover the largest write end (later chunks overwrite
        # the spill of earlier ones, the last chunk's spill is dead columns)
        write_end = 0
        off = 0
        for n_frames in frames_per_chunk:
            write_end = max(write_end, off + (-(-n_frames // bf)) * bf)
            off += n_frames
        t_alloc = -(-max(total, write_end, 1) // FRAME_BUCKET) * FRAME_BUCKET

        buf = jnp.zeros((cfg.h_pix, t_alloc), jnp.float32)
        gmin = jnp.float32(jnp.inf)
        gmax = jnp.float32(-jnp.inf)

        out_offset = 0
        for (s, e), n_frames in zip(spans, frames_per_chunk):
            n_blocks = -(-n_frames // bf)
            l_bucket = n_blocks * bf * hop
            # centered zero padding (librosa center=True, pad_mode='constant')
            # + trailing bucket pad; total padded length l_bucket + 2*pad
            # covers every strided segment slice
            if packed is not None or use_codec:
                # packed wire path: only the k-bit payload crosses the link
                # (column-bucketed to bound compiles); the zero padding is
                # materialized on device by the decode program
                from .wirecodec import decode_to_padded

                pa = packed if packed is not None else encode(samples[s:e])
                gran = 8192
                ng = pa.payload.shape[1]
                ng_b = -(-ng // gran) * gran
                payload = pa.payload
                if ng_b != ng:
                    payload = np.zeros((payload.shape[0], ng_b), np.uint8)
                    payload[:, :ng] = pa.payload
                padded = decode_to_padded(
                    payload, pa.outlier_pos, pa.outlier_res,
                    jnp.int32(pa.n_samples), pa.k,
                    l_bucket + 2 * pad, pad,
                )
            else:
                # built on host so every transferred shape is bucketed
                # (bounds compilations across a sweep)
                padded_np = np.zeros((l_bucket + 2 * pad,), samples.dtype)
                padded_np[pad:pad + (e - s)] = samples[s:e]
                padded = jnp.asarray(padded_np)
            buf, gmin, gmax = _chunk_spectrogram(
                padded, buf, jnp.int32(out_offset), jnp.int32(n_frames),
                gmin, gmax,
                n_blocks, bf, hop, n_fft, cfg.low_idx, cfg.high_idx, cfg.db_floor,
                inv_scale,
            )
            out_offset += n_frames

        spec = _normalize(buf, gmin, gmax)
        cols = window_column_indices(
            total, cfg.w_pix, cfg.hop_spectro, empty_width=empty_width
        )
        return FrontendResult(
            spec_padded=spec, window_cols=cols, total_frames=total,
            s_min=gmin, s_max=gmax,
        )
