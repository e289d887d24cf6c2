"""Golden tests for the device spectrogram front-end vs a numpy oracle that
reproduces the reference's librosa pipeline (librosa.stft center=True,
pad_mode='constant', periodic hann; reference: prepare_dataset.py:108-294)."""

import numpy as np
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import FrontendConfig
from birdsoundclassif_tpu.audio.frontend import (
    SpectrogramFrontend,
    amp_to_db,
    num_windows,
    window_column_indices,
)


def hann_periodic(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_mag_oracle(y, n_fft, hop):
    """|librosa.stft|: centered, zero-padded, periodic hann."""
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float64), pad, mode="constant")
    n_frames = 1 + len(y) // hop
    win = hann_periodic(n_fft)
    frames = np.stack([yp[t * hop:t * hop + n_fft] for t in range(n_frames)])
    return np.abs(np.fft.rfft(frames * win, axis=1)).T  # (bins, frames)


def amp_to_db_np(x, min_level_db=-100):
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20 * np.log10(np.maximum(min_level, x))


def reference_pipeline_oracle(y, cfg: FrontendConfig):
    """Chunked STFT + dB + crop + joint min-max normalize
    (reference: File_Processor.spectrogram, prepare_dataset.py:233-252)."""
    max_l = cfg.stft_chunk_samples
    stfts = []
    for k in range(int(len(y) / max_l) + 1):
        chunk = y[k * max_l:(k + 1) * max_l]
        if len(chunk) == 0:
            continue
        stfts.append(amp_to_db_np(stft_mag_oracle(chunk, cfg.win_length, cfg.hop_length)))
    stfts = [s[cfg.low_idx:cfg.high_idx, :] for s in stfts]
    s_max = max(s.max() for s in stfts)
    s_min = min(s.min() for s in stfts)
    return np.concatenate([(s - s_min) / (s_max - s_min) for s in stfts], axis=1)


def split_oracle(spec, w_pix, hop_spectro):
    """reference: split_power_spec (single-chunk equivalent on the
    concatenated spectrogram), incl. the stepwise reflect tail pad."""
    total = spec.shape[1]
    n = max(1, int(1 + np.ceil((total - w_pix) / hop_spectro)))
    imgs = [spec[:, k * hop_spectro:k * hop_spectro + w_pix] for k in range(n)]
    if imgs[-1].shape[1] < w_pix:
        max_pix = total - w_pix
        empty = total - max_pix
        while imgs[-1].shape[1] < w_pix:
            pad = max(1, min(empty, w_pix - imgs[-1].shape[1]))
            imgs[-1] = np.pad(imgs[-1], ((0, 0), (0, pad)), mode="reflect")
            empty += pad
    return np.stack(imgs)


TINY = FrontendConfig(
    sample_rate=8000,
    freq_accuracy=100.0,   # win = 80
    dt=0.003,              # hop = 24
    h_pix=30,
    low_freq_request=500.0,
    w_pix=64,
    overlap_spectro=0.2,   # hop_spectro = 51
    stft_chunk_samples=50_000,
)


def tone(rng, n, sr, freqs=(600, 1500, 2900)):
    t = np.arange(n) / sr
    y = sum(a * np.sin(2 * np.pi * f * t + p)
            for a, f, p in zip((0.5, 0.3, 0.2), freqs, (0.0, 1.0, 2.0)))
    return (y + 0.01 * rng.standard_normal(n)).astype(np.float32)


class TestDerivedConstants:
    def test_reference_invariants(self):
        cfg = FrontendConfig()
        assert cfg.win_length == 1324
        assert cfg.hop_length == 132
        assert cfg.low_idx == 16
        assert cfg.high_idx == 391
        assert cfg.hop_spectro == 819
        assert abs(cfg.dt_actual - 0.002993197278911565) < 1e-15
        assert abs(cfg.freq_accuracy_actual - 33.30815709969789) < 1e-10
        assert abs(cfg.low_freq - 499.62235649546826) < 1e-9


class TestSTFT:
    @pytest.mark.parametrize("n", [7_000, 50_000, 123_456])
    def test_spectrogram_matches_oracle(self, rng, n):
        y = tone(rng, n, TINY.sample_rate)
        fe = SpectrogramFrontend(TINY, block_frames=512)
        res = fe.process(y)
        want = reference_pipeline_oracle(y, TINY)
        got = np.asarray(res.spec)
        assert got.shape == want.shape
        assert res.total_frames == want.shape[1]
        np.testing.assert_allclose(got, want, atol=5e-4)  # f32 DFT vs f64 FFT; PNG quantum is 3.9e-3

    def test_chunked_equals_reference_chunking(self, rng):
        # crosses one 50k chunk boundary -> per-chunk zero padding at the seam
        y = tone(rng, 80_000, TINY.sample_rate)
        fe = SpectrogramFrontend(TINY, block_frames=777)
        res = fe.process(y)
        want = reference_pipeline_oracle(y, TINY)
        np.testing.assert_allclose(np.asarray(res.spec), want, atol=5e-4)
        # frame count = sum over chunks of 1 + len//hop
        lens = [50_000, 30_000]
        assert res.total_frames == sum(1 + l // TINY.hop_length for l in lens)


class TestWindows:
    @pytest.mark.parametrize("total", [40, 64, 65, 300, 64 + 51 * 3])
    def test_split_matches_oracle(self, rng, total):
        spec = rng.random((TINY.h_pix, total)).astype(np.float32)
        want = split_oracle(spec, TINY.w_pix, TINY.hop_spectro)
        cols = window_column_indices(total, TINY.w_pix, TINY.hop_spectro)
        got = np.stack([spec[:, c] for c in cols])
        np.testing.assert_array_equal(got, want)

    def test_windows_device_gather(self, rng):
        y = tone(rng, 20_000, TINY.sample_rate)
        fe = SpectrogramFrontend(TINY, block_frames=256)
        res = fe.process(y)
        wins = np.asarray(res.windows())
        assert wins.shape == (res.n_windows, TINY.h_pix, TINY.w_pix)
        ref = split_oracle(np.asarray(res.spec), TINY.w_pix, TINY.hop_spectro)
        np.testing.assert_allclose(wins, ref, atol=1e-6)

    def test_single_short_window(self):
        cols = window_column_indices(40, 64, 51)
        assert cols.shape == (1, 64)
        # stepwise reflect growth of a 40-wide tail to 64
        spec = np.arange(40, dtype=np.float32)[None].repeat(3, 0)
        want = split_oracle(spec, 64, 51)
        np.testing.assert_array_equal(spec[:, cols[0]], want[0])


class TestAmpToDb:
    def test_matches_reference_formula(self, rng):
        x = np.abs(rng.random((50,)).astype(np.float32)) * 10
        x[0] = 0.0  # floor case
        got = np.asarray(amp_to_db(jnp.asarray(x)))
        want = amp_to_db_np(x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
