"""Pallas fused STFT kernel vs the XLA chunk path (interpret mode on CPU).

The segment-decomposed DFT sums 11 partial matmuls, so f32 ordering differs
from the single-matmul XLA path by ~1e-3 dB — far below the PNG quantum
(0.39 dB-range units) the reference trains on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.audio.frontend import _chunk_spectrogram
from birdsoundclassif_tpu.audio.pallas_stft import stft_db_pallas
from birdsoundclassif_tpu.config import FrontendConfig


@pytest.mark.parametrize("n_samples,inv_scale", [(90_000, 1.0), (40_000, 1.0 / 32768.0)])
def test_matches_xla_chunk_path(rng, n_samples, inv_scale):
    cfg = FrontendConfig()
    hop, n_fft = cfg.hop_length, cfg.win_length
    bf = 256
    pad = n_fft // 2
    n_frames = 1 + n_samples // hop
    n_blocks = -(-n_frames // bf)
    padded = np.zeros(n_blocks * bf * hop + 2 * pad, np.float32)
    if inv_scale != 1.0:
        sig = (rng.standard_normal(n_samples) * 3000).astype(np.int16)
        padded[pad:pad + n_samples] = sig  # int values stored as f32
    else:
        sig = rng.standard_normal(n_samples).astype(np.float32) * 0.1
        padded[pad:pad + n_samples] = sig

    db_p, mn_p, mx_p = stft_db_pallas(
        jnp.asarray(padded), jnp.int32(n_frames), n_blocks, bf, hop, n_fft,
        cfg.low_idx, cfg.high_idx, cfg.db_floor, inv_scale, interpret=True,
    )
    buf = jnp.zeros((cfg.h_pix, n_blocks * bf), jnp.float32)
    buf, mn_x, mx_x = _chunk_spectrogram(
        jnp.asarray(padded), buf, jnp.int32(0), jnp.int32(n_frames),
        jnp.float32(np.inf), jnp.float32(-np.inf),
        n_blocks, bf, hop, n_fft, cfg.low_idx, cfg.high_idx, cfg.db_floor,
        inv_scale,
    )
    np.testing.assert_allclose(
        np.asarray(db_p)[:, :n_frames], np.asarray(buf)[:, :n_frames], atol=5e-3
    )
    assert abs(float(mn_p) - float(mn_x)) < 5e-3
    assert abs(float(mx_p) - float(mx_x)) < 5e-3
