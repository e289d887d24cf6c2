"""Main-path mp3 ingestion (VERDICT r3 missing #3).

The reference decodes mp3 through librosa.load -> audioread
(prepare_dataset.py:160-184) and ships mp3->wav helpers (utils.py:18-56);
the TPU build decodes in-process via libmpg123 (audio/mp3.py) with ffmpeg
as the fallback. These tests round-trip real mp3 bytes (encoded with
libmp3lame, no ffmpeg needed) and check the mp3 twin of a wav recording
produces matching detections end-to-end.
"""

import os
import wave

import numpy as np
import pytest

from birdsoundclassif_tpu.audio import mp3 as mp3mod
from birdsoundclassif_tpu.audio.wavio import load_audio

pytestmark = pytest.mark.skipif(
    not (mp3mod.mpg123_available() and mp3mod.lame_available()),
    reason="libmpg123/libmp3lame not present",
)

SR = 44_100


def _tone(seconds=4.0, f0=3000.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    sig = 0.3 * np.sin(2 * np.pi * f0 * t) * (np.sin(2 * np.pi * 1.3 * t) > 0)
    return (sig + 0.005 * rng.standard_normal(len(t))).astype(np.float32)


def _write_wav(path, samples):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(x.tobytes())


def _align(a, b, max_lag=4096):
    """Best cross-correlation lag of b vs a over +-max_lag (mp3 encoder
    delay when the gapless tags are not honored)."""
    n = min(len(a), len(b)) - max_lag
    seg = a[max_lag: max_lag + n]
    best = (0, -np.inf)
    for lag in range(0, 2 * max_lag, 16):
        c = float(np.dot(seg[: 1 << 16], b[lag: lag + (1 << 16)]))
        if c > best[1]:
            best = (lag, c)
    return best[0] - max_lag


def test_decode_roundtrip(tmp_path):
    sig = _tone()
    path = str(tmp_path / "t.mp3")
    mp3mod.encode_mp3(path, sig, SR)
    x, sr = mp3mod.decode_mp3(path)
    assert sr == SR
    assert x.shape[1] == 1
    mono = x[:, 0]
    # lame pads with the codec delay; lengths agree to within a few frames
    assert abs(len(mono) - len(sig)) < 5000
    lag = _align(sig, mono)
    n = min(len(sig), len(mono)) - abs(lag) - 4096
    a = sig[4096: 4096 + n]
    b = mono[4096 + lag: 4096 + lag + n]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.95, f"decoded signal decorrelated (corr={corr:.3f})"


def test_load_audio_mp3(tmp_path):
    """load_audio routes .mp3 through the in-process decoder and returns
    the same (mono float32 @44.1k) contract as the wav path."""
    sig = _tone(seconds=3.0)
    mp3_path = str(tmp_path / "t.mp3")
    mp3mod.encode_mp3(mp3_path, sig, SR)
    x = load_audio(mp3_path)
    assert x is not None and x.dtype == np.float32 and x.ndim == 1
    assert abs(len(x) - len(sig)) < 5000


def test_convert_mp3_to_wav_native(tmp_path):
    sig = _tone(seconds=2.0)
    mp3_path = str(tmp_path / "t.mp3")
    mp3mod.encode_mp3(mp3_path, sig, SR)
    wav_path = str(tmp_path / "t.wav")
    out = mp3mod.convert_mp3_to_wav_native(mp3_path, wav_path)
    assert out == wav_path
    y = load_audio(wav_path)
    assert y is not None and abs(len(y) - len(sig)) < 5000


def test_xeno_canto_converter_without_ffmpeg(tmp_path, monkeypatch):
    """data/xeno_canto.convert_mp3_to_wav falls back to the libmpg123 path
    when ffmpeg is absent (reference requires ffmpeg: utils.py:47-49)."""
    import shutil as _shutil

    from birdsoundclassif_tpu.data import xeno_canto

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    sig = _tone(seconds=1.5)
    mp3_path = str(tmp_path / "rec.mp3")
    mp3mod.encode_mp3(mp3_path, sig, SR)
    wav_path = xeno_canto.convert_mp3_to_wav(mp3_path)
    assert wav_path == str(tmp_path / "rec.wav")
    assert not os.path.exists(mp3_path)  # consumed, like the reference
    y = load_audio(wav_path)
    assert y is not None and abs(len(y) - len(sig)) < 5000


class TestDetectionsParity:
    def _small_model(self):
        import jax

        from birdsoundclassif_tpu.config import NbmConfig
        from birdsoundclassif_tpu.models import NbmModel

        cfg = NbmConfig()
        cfg.num_classes = 6
        cfg.out_fpn_chan = 32
        cfg.fpn_p_chan = 48
        cfg.depth_rcnn = 1
        params = NbmModel.init(jax.random.PRNGKey(0), cfg)
        return params, cfg

    def test_mp3_twin_matches_wav(self, tmp_path):
        """The mp3 twin of a wav recording flows through the identical
        pipeline and yields structurally matching detections.

        The spectrogram-domain check is tight (the decode is what this
        feature adds). The detection-set check is structural: the model
        here is RANDOM-weight, so its scores are near-uniform and mp3's
        codec noise legitimately flips marginal NMS slots — a strict
        box-for-box gate would test the random seed, not the decoder.
        The trained-checkpoint box-level parity runs on hardware in
        scripts/train_hard.py's eval phase (mp3_twin_parity in the
        TRAINING_E2E artifact), where 'same detections' is meaningful."""
        from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
        from birdsoundclassif_tpu.audio.wavio import load_audio_raw
        from birdsoundclassif_tpu.infer.pipeline import run_detection

        params, cfg = self._small_model()
        sig = _tone(seconds=4.0)
        wav_path = str(tmp_path / "twin.wav")
        mp3_path = str(tmp_path / "twin.mp3")
        _write_wav(wav_path, sig)
        mp3mod.encode_mp3(mp3_path, sig, SR)

        # 1) spectral closeness of the decoded twins through the real
        # frontend. Two lossy effects are EXPECTED and must be normalized
        # out before comparing: the codec delay shifts the time axis a few
        # frames, and the mp3 noise floor moves the file's global min-max
        # normalization (a uniform brightness shift of the whole image).
        # After z-scoring, the overlapping interiors must correlate highly.
        # Most pixels are NOISE FLOOR, where wav dither and mp3 codec
        # artifacts are uncorrelated by construction — a whole-image
        # correlation is meaningless. The meaningful invariant is the
        # SIGNAL: the tone band's time profile must line up.
        fe = SpectrogramFrontend(cfg.frontend)
        sa = np.asarray(fe.process(load_audio_raw(wav_path)).spec)
        sb = np.asarray(fe.process(load_audio_raw(mp3_path)).spec)
        row = int(np.argmax(sa.var(axis=1)))  # the 3 kHz tone band
        t = min(sa.shape[1], sb.shape[1]) - 16
        a = sa[row, 16:t]
        a = (a - a.mean()) / a.std()
        best = -1.0
        for lag in range(-12, 13):
            b = sb[row, 16 + lag: t + lag]
            if b.shape != a.shape:
                continue
            bz = (b - b.mean()) / b.std()
            best = max(best, float((a * bz).mean()))
        assert best > 0.9, f"signal-band time-profile correlation {best:.3f}"

        # 2) structural detection agreement end-to-end
        from birdsoundclassif_tpu.eval.ap import match_detection_sets

        out_wav = run_detection(params, cfg, wav_path, min_score=0.0, bs=2)
        out_mp3 = run_detection(params, cfg, mp3_path, min_score=0.0, bs=2)
        assert out_wav is not None and out_mp3 is not None
        a = match_detection_sets(out_wav, out_mp3)
        assert a["n_a"] > 0, "wav twin produced no detections at min_score 0"
        assert a["n_b"] > 0, "mp3 twin produced no detections"
        # counts in the same ballpark and at least half the boxes matched
        # class-agnostically (random weights; see docstring)
        assert a["n_b"] <= 2 * a["n_a"] and a["n_a"] <= 2 * a["n_b"], a
        assert a["agnostic_rate"] >= 0.5, a

    def test_cli_accepts_mp3(self, tmp_path, monkeypatch):
        """The CLI globs .mp3 alongside .wav and writes <name>.txt
        (reference nbm_detect.py:24 only globbed wav)."""
        from birdsoundclassif_tpu.infer import cli
        from birdsoundclassif_tpu.utils.checkpoint import save_params

        params, cfg = self._small_model()
        ckpt_dir = tmp_path / "model_weights"
        ckpt_dir.mkdir()
        cfg.save(str(ckpt_dir / "args"))
        save_params(str(ckpt_dir), params)
        audio_dir = tmp_path / "audio"
        audio_dir.mkdir()
        mp3mod.encode_mp3(str(audio_dir / "a.mp3"), _tone(seconds=2.0), SR)
        monkeypatch.chdir(tmp_path)
        rc = cli.main(["--ckpt", str(ckpt_dir), "--audio_dir", str(audio_dir),
                       "--min_score", "0.0", "--batch", "2"])
        assert rc == 0
        txt = audio_dir / "a.txt"
        assert txt.exists()
        assert isinstance(eval(txt.read_text()), dict)

