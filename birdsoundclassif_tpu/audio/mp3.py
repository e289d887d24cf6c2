"""In-process mp3 decode via libmpg123 (ctypes) — no ffmpeg required.

The reference ingests mp3 through librosa.load, which delegates to
audioread/ffmpeg (reference: nbm_datasets/prepare_dataset.py:160-184), and
ships separate mp3->wav conversion helpers (nbm_datasets/utils.py:18-56).
This module is the TPU build's main-path equivalent: a direct binding to
the system libmpg123 decoder, so `.mp3` recordings flow through the same
`load_audio`/`load_audio_raw` entry points as `.wav` with no subprocess,
no temp files and no ffmpeg dependency. The ffmpeg fallback in
audio/wavio.py still covers every other compressed format.

The companion `encode_mp3` binds libmp3lame when present; it exists so the
mp3 path can be round-trip TESTED in an image that has no ffmpeg binary
(tests/test_audio.py), and mirrors the reference's wav->mp3 direction only
to that extent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional, Tuple

import numpy as np

# mpg123.h constants
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_ENC_SIGNED_16 = 0xD0

_mpg123_lib = None


def _load_mpg123():
    global _mpg123_lib
    if _mpg123_lib is None:
        name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
        lib = ctypes.CDLL(name)
        lib.mpg123_init()
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
        lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                      ctypes.c_int, ctypes.c_int]
        lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_size_t)]
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_strerror.restype = ctypes.c_char_p
        lib.mpg123_strerror.argtypes = [ctypes.c_void_p]
        _mpg123_lib = lib
    return _mpg123_lib


def mpg123_available() -> bool:
    try:
        _load_mpg123()
        return True
    except OSError:
        return False


def decode_mp3(path: str) -> Tuple[np.ndarray, int]:
    """Decode an mp3 file to (float32 samples (n, channels), sample_rate).

    The output format is locked to the stream's native rate/channels as
    signed 16-bit (mp3 carries no more than 16 bits of precision), scaled
    to [-1, 1) exactly like the wav PCM16 path (audio/wavio.py _parse_wav).
    Raises RuntimeError on undecodable input.
    """
    lib = _load_mpg123()
    err = ctypes.c_int(0)
    mh = lib.mpg123_new(None, ctypes.byref(err))
    if not mh:
        raise RuntimeError(f"mpg123_new failed (err={err.value})")
    try:
        if lib.mpg123_open(mh, path.encode()) != _MPG123_OK:
            raise RuntimeError(
                f"mpg123_open: {lib.mpg123_strerror(mh).decode()}")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        encoding = ctypes.c_int(0)
        if lib.mpg123_getformat(mh, ctypes.byref(rate), ctypes.byref(channels),
                                ctypes.byref(encoding)) != _MPG123_OK:
            raise RuntimeError(
                f"mpg123_getformat: {lib.mpg123_strerror(mh).decode()}")
        # pin the output format so mid-stream format changes can't tear
        # the sample buffer
        lib.mpg123_format_none(mh)
        if lib.mpg123_format(mh, rate.value, channels.value,
                             _MPG123_ENC_SIGNED_16) != _MPG123_OK:
            raise RuntimeError(
                f"mpg123_format: {lib.mpg123_strerror(mh).decode()}")
        chunks = []
        buf = ctypes.create_string_buffer(1 << 18)
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(mh, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(buf.raw[: done.value])
            if rc == _MPG123_DONE:
                break
            if rc != _MPG123_OK:
                raise RuntimeError(
                    f"mpg123_read: {lib.mpg123_strerror(mh).decode()}")
        if not chunks:
            raise RuntimeError(f"no audio decoded from {path}")
        raw = np.frombuffer(b"".join(chunks), "<i2")
        n = (len(raw) // channels.value) * channels.value
        x = raw[:n].astype(np.float32).reshape(-1, channels.value) / 32768.0
        return x, int(rate.value)
    finally:
        lib.mpg123_close(mh)
        lib.mpg123_delete(mh)


_lame_lib = None


def _load_lame():
    global _lame_lib
    if _lame_lib is None:
        name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
        lib = ctypes.CDLL(name)
        lib.lame_init.restype = ctypes.c_void_p
        for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
                   "lame_set_brate", "lame_set_mode"):
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lame_init_params.argtypes = [ctypes.c_void_p]
        lib.lame_encode_buffer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_short), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_int]
        lib.lame_close.argtypes = [ctypes.c_void_p]
        _lame_lib = lib
    return _lame_lib


def lame_available() -> bool:
    try:
        _load_lame()
        return True
    except OSError:
        return False


def encode_mp3(path: str, samples: np.ndarray, sample_rate: int,
               bitrate_kbps: int = 128) -> None:
    """Encode mono float32/int16 samples as an mp3 file via libmp3lame."""
    lib = _load_lame()
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    samples = np.ascontiguousarray(samples)
    gfp = lib.lame_init()
    if not gfp:
        raise RuntimeError("lame_init failed")
    try:
        lib.lame_set_in_samplerate(gfp, sample_rate)
        lib.lame_set_num_channels(gfp, 1)
        lib.lame_set_mode(gfp, 3)  # MONO
        lib.lame_set_brate(gfp, bitrate_kbps)
        if lib.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")
        n = len(samples)
        out = ctypes.create_string_buffer(int(1.25 * n) + 7200)
        pcm = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
        written = lib.lame_encode_buffer(gfp, pcm, pcm, n, out, len(out))
        if written < 0:
            raise RuntimeError(f"lame_encode_buffer: {written}")
        tail = ctypes.create_string_buffer(7200)
        flushed = lib.lame_encode_flush(gfp, tail, len(tail))
        with open(path, "wb") as f:
            f.write(out.raw[:written])
            f.write(tail.raw[:flushed])
    finally:
        lib.lame_close(gfp)


def convert_mp3_to_wav_native(mp3_path: str, wav_path: str,
                              sample_rate: int = 44_100) -> Optional[str]:
    """mp3 -> mono PCM16 wav at sample_rate using the in-process decoder
    (replaces the reference's ffmpeg transcode, utils.py:47-49, when the
    binary is absent). Returns wav_path, or None when undecodable."""
    import wave

    from .wavio import resample

    try:
        x, sr = decode_mp3(mp3_path)
    except (RuntimeError, OSError) as e:
        print(f"mp3 decode failed: {mp3_path}: {e}")
        return None
    mono = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
    if sr != sample_rate:
        mono = resample(mono, sr, sample_rate)
    pcm = (np.clip(mono, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return wav_path
