"""Bound the resampler deviation (VERDICT r1 missing #4 / next #9).

The reference shells out to ffmpeg to resample off-rate audio
(reference: prepare_dataset.py:175-178); this framework uses a polyphase
filter (scipy.signal.resample_poly; same algorithm in the native C++ lib).
ffmpeg is not installable here, so the golden is the ANALYTIC ideal: a
band-limited test signal sampled directly at 44.1 kHz — the target every
good resampler (ffmpeg's swr included) approximates. If the polyphase
output is within a small bound of the ideal, its deviation from ffmpeg is
bounded by the triangle inequality. The assertions then bound what
actually matters for mAP: box-coordinate drift through the full
spectrogram front-end must be ZERO pixels on tonal content.
"""

import numpy as np
import pytest

from birdsoundclassif_tpu.audio.wavio import resample
from birdsoundclassif_tpu.config import FrontendConfig


def _smooth_env(t, t0, t1, ramp=0.02):
    up = np.clip((t - t0) / ramp, 0, 1)
    dn = np.clip((t1 - t) / ramp, 0, 1)
    e = np.minimum(up, dn)
    return 0.5 - 0.5 * np.cos(np.pi * np.clip(e, 0, 1))


def _sig(t):
    """Band-limited multi-tone burst (smooth envelope keeps it band-limited
    so the analytically sampled 44.1 kHz signal IS the ideal resample)."""
    env = _smooth_env(t, 0.8, 1.4)
    return (
        0.5 * np.sin(2 * np.pi * 1200 * t)
        + 0.3 * np.sin(2 * np.pi * 3000 * t + 1.0)
        + 0.2 * np.sin(2 * np.pi * 7900 * t + 2.0)
    ) * env + 0.25 * np.sin(2 * np.pi * 900 * t)


@pytest.fixture(scope="module")
def pair():
    t48 = np.arange(int(48_000 * 3.0)) / 48_000
    t44 = np.arange(int(44_100 * 3.0)) / 44_100
    got = resample(_sig(t48).astype(np.float32), 48_000, 44_100)
    ideal = _sig(t44).astype(np.float32)
    n = min(len(got), len(ideal))
    return got[:n], ideal[:n]


def test_waveform_close_to_ideal(pair):
    got, ideal = pair
    err = np.abs(got - ideal)[4000:-4000]  # exclude filter edge transients
    assert err.max() < 2e-3
    assert np.sqrt((err ** 2).mean()) < 5e-4


def test_box_pixel_drift_is_zero(pair):
    """Through the full front-end, the quantities that set box coordinates —
    burst onset/offset columns and per-frame peak rows — must be identical
    between the polyphase resample and the ideal."""
    import jax

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend

    got, ideal = pair
    fe = SpectrogramFrontend(FrontendConfig())
    a = np.asarray(fe.process(got).spec)
    b = np.asarray(fe.process(ideal).spec)
    assert a.shape == b.shape

    # peak row identical in every frame with real energy
    cols = b.max(axis=0) > 0.5
    assert cols.sum() > 500
    assert (a[:, cols].argmax(axis=0) == b[:, cols].argmax(axis=0)).all()

    # burst onset/offset columns identical for the 3 kHz component
    cfg = FrontendConfig()
    row = int(round((3000 - cfg.low_freq) / cfg.freq_accuracy_actual))
    for spec_row in (a[row], b[row]):
        assert (spec_row > 0.6).any()
    assert np.argmax(a[row] > 0.6) == np.argmax(b[row] > 0.6)
    assert (
        len(a[row]) - np.argmax(a[row][::-1] > 0.6)
        == len(b[row]) - np.argmax(b[row][::-1] > 0.6)
    )

    # normalized-spectrogram drift on signal-bearing pixels stays small
    # (the dB floor under silence is resampler-sensitive but box-irrelevant)
    strong = b > 0.35
    assert np.quantile(np.abs(a - b)[strong], 0.99) < 0.08


def test_native_polyphase_matches_scipy_if_built(pair):
    from birdsoundclassif_tpu.native import wav as native_wav

    t48 = np.arange(int(48_000 * 1.0)) / 48_000
    x = _sig(t48).astype(np.float32)
    got = native_wav.resample(x, 48_000, 44_100)
    if got is None:
        pytest.skip("native lib not built")
    ref = resample(x, 48_000, 44_100)
    n = min(len(got), len(ref))
    # same polyphase design: agreement well below the ideal-deviation bound
    assert np.abs(got[:n] - ref[:n]).max() < 2e-3
