"""Lossless PCM wire codec (audio/wirecodec.py): exact round-trips at every
supported bit width, outlier handling, and bitwise front-end parity between
the packed and raw transfer paths."""

import numpy as np
import pytest

from birdsoundclassif_tpu.audio.wirecodec import (
    OUTLIER_CAP,
    SUPPORTED_BITS,
    PackedAudio,
    choose_bits,
    decode_to_padded,
    encode,
)


def _signals():
    rng = np.random.default_rng(7)
    n = 40_000
    t = np.arange(n) / 44100.0
    quiet = (300 * rng.standard_normal(n)).astype(np.int16)
    tone = np.clip(
        0.2 * 32767 * np.sin(2 * np.pi * 6400 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0)
        + 300 * rng.standard_normal(n),
        -32768, 32767,
    ).astype(np.int16)
    # worst case: full-range alternation — every delta is an outlier at k<16
    harsh = np.where(np.arange(n) % 2 == 0, 32767, -32768).astype(np.int16)
    short = np.asarray([5, -3, 10_000, -32768, 32767], np.int16)
    return {"quiet": quiet, "tone": tone, "harsh": harsh, "short": short}


def _decode_np(pa: PackedAudio) -> np.ndarray:
    """Independent numpy reference decoder."""
    g = 8 // np.gcd(pa.k, 8)
    n_groups = pa.payload.shape[1]
    mask = (1 << pa.k) - 1
    vals = np.zeros((n_groups, g), np.int64)
    for j in range(g):
        lo_bit = j * pa.k
        v = np.zeros(n_groups, np.int64)
        for i in range(pa.payload.shape[0]):
            sh = 8 * i - lo_bit
            if sh >= pa.k or sh <= -8:
                continue
            b = pa.payload[i].astype(np.int64)
            v |= (b << sh) if sh >= 0 else (b >> -sh)
        u = v & mask
        vals[:, j] = np.where(u >= 1 << (pa.k - 1), u - (1 << pa.k), u)
    d = vals.reshape(-1)[: pa.n_samples].copy()
    live = pa.outlier_res != 0
    np.add.at(d, pa.outlier_pos[live], pa.outlier_res[live])
    return np.cumsum(d).astype(np.int16)


@pytest.mark.parametrize("name", ["quiet", "tone", "harsh", "short"])
def test_roundtrip_auto_bits(name):
    x = _signals()[name]
    pa = encode(x)
    assert pa.k in SUPPORTED_BITS
    np.testing.assert_array_equal(_decode_np(pa), x)


@pytest.mark.parametrize("k", SUPPORTED_BITS)
def test_roundtrip_forced_bits(k):
    x = _signals()["tone"]
    pa = encode(x, k=k)
    # harsh widths fall back to 16 when the outlier table would overflow
    assert pa.k == k or pa.k == 16
    np.testing.assert_array_equal(_decode_np(pa), x)


def test_clustered_outlier_block_exact():
    """A block dense with full-range deltas stresses the prefix-sum's
    exactness bound (on TPU the matmul runs with bf16 operand mantissas;
    the hi/lo plane split must keep every accumulation exact)."""
    rng = np.random.default_rng(3)
    n = 8192
    x = np.zeros(n, np.int16)
    x[1000:1512:2] = 32767          # alternating full-range jumps,
    x[1001:1513:2] = -32768         # all inside one 512-sample block
    x[4000:] = (200 * rng.standard_normal(n - 4000)).astype(np.int16)
    pa = encode(x, k=10)            # forces those jumps into the table
    dec = np.asarray(
        decode_to_padded(pa.payload, pa.outlier_pos, pa.outlier_res,
                         np.int32(pa.n_samples), pa.k, n + 64, 0)
    )[:n]
    np.testing.assert_array_equal(dec, x)


def test_choose_bits_and_wire_size():
    sig = _signals()
    assert choose_bits(np.diff(sig["quiet"].astype(np.int32), prepend=0)) <= 12
    assert encode(sig["harsh"]).k == 16
    pa = encode(sig["quiet"])
    raw = sig["quiet"].size * 2
    assert pa.wire_bytes < raw  # the whole point
    # outlier table is size-bucketed and empty for clean streams
    assert pa.outlier_pos.size % 1024 == 0 and pa.outlier_pos.size <= OUTLIER_CAP


@pytest.mark.parametrize("k", [8, 12, 13, 14, 16])
def test_device_decode_matches_layout(k):
    x = _signals()["tone"]
    pa = encode(x, k=k)
    pad, out_len = 662, x.size + 2 * 662 + 1000
    dec = np.asarray(
        decode_to_padded(
            pa.payload, pa.outlier_pos, pa.outlier_res,
            np.int32(pa.n_samples), pa.k, out_len, pad,
        )
    )
    ref = np.zeros(out_len, np.int16)
    ref[pad:pad + x.size] = x
    np.testing.assert_array_equal(dec, ref)


def test_device_decode_bucketed_payload():
    """Column-padded payload (the sweep's compile-bucketing) decodes the
    same: padded groups hold zero deltas and are masked past n_samples."""
    x = _signals()["quiet"]
    pa = encode(x)
    ng = pa.payload.shape[1]
    ng_b = ng + 517
    payload = np.zeros((pa.payload.shape[0], ng_b), np.uint8)
    payload[:, :ng] = pa.payload
    pad, out_len = 662, x.size + 2 * 662 + 8 * 517 + 64
    dec = np.asarray(
        decode_to_padded(
            payload, pa.outlier_pos, pa.outlier_res,
            np.int32(pa.n_samples), pa.k, out_len, pad,
        )
    )
    ref = np.zeros(out_len, np.int16)
    ref[pad:pad + x.size] = x
    np.testing.assert_array_equal(dec, ref)


@pytest.mark.parametrize("name", ["quiet", "tone", "harsh", "short"])
def test_native_encoder_matches_numpy_if_built(name):
    """The one-pass C++ encoder (nbm_native.cpp nbm_wire_pack) must emit
    byte-identical streams to the numpy reference encoder."""
    import birdsoundclassif_tpu.audio.wirecodec as wc
    from birdsoundclassif_tpu.native import wav as native

    if not native.wire_available():
        pytest.skip("native lib not built")
    x = _signals()[name]
    pa = encode(x)  # native path (wire_available)
    orig = wc._native_encode
    wc._native_encode = lambda *a: None
    try:
        pb = encode(x)  # numpy reference
    finally:
        wc._native_encode = orig
    assert pa.k == pb.k and pa.n_samples == pb.n_samples
    np.testing.assert_array_equal(pa.payload, pb.payload)
    np.testing.assert_array_equal(pa.outlier_pos, pb.outlier_pos)
    np.testing.assert_array_equal(pa.outlier_res, pb.outlier_res)


def test_frontend_packed_path_bitwise_parity():
    """wire_codec=True produces a bitwise-identical spectrogram to the raw
    int16 transfer (the codec is lossless, the downstream program is the
    same compiled function)."""
    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.config import FrontendConfig

    cfg = FrontendConfig()
    x = _signals()["tone"]
    raw = SpectrogramFrontend(cfg, wire_codec=False).process(x)
    packed = SpectrogramFrontend(cfg, wire_codec=True).process(x)
    np.testing.assert_array_equal(
        np.asarray(raw.spec_padded), np.asarray(packed.spec_padded)
    )
    np.testing.assert_array_equal(raw.window_cols, packed.window_cols)
    assert raw.total_frames == packed.total_frames


def test_frontend_multichunk_packed_parity():
    """Long files are packed one STFT chunk at a time; the multi-chunk
    spectrogram (jointly min-max normalized across chunks, reference:
    prepare_dataset.py:233-252) must match the raw path bitwise."""
    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.config import FrontendConfig

    cfg = FrontendConfig(
        sample_rate=8000, freq_accuracy=100.0, dt=0.003, h_pix=30,
        low_freq_request=500.0, w_pix=64, overlap_spectro=0.2,
        stft_chunk_samples=50_000,
    )
    rng = np.random.default_rng(11)
    n = 120_000  # 3 chunks
    t = np.arange(n) / 8000.0
    x = np.clip(
        0.4 * 32767 * np.sin(2 * np.pi * 900 * t) + 300 * rng.standard_normal(n),
        -32768, 32767,
    ).astype(np.int16)
    raw = SpectrogramFrontend(cfg, block_frames=512, wire_codec=False).process(x)
    packed = SpectrogramFrontend(cfg, block_frames=512, wire_codec=True).process(x)
    np.testing.assert_array_equal(
        np.asarray(raw.spec_padded), np.asarray(packed.spec_padded)
    )
    assert raw.total_frames == packed.total_frames


def test_frontend_accepts_pre_encoded_packet():
    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.config import FrontendConfig

    cfg = FrontendConfig()
    x = _signals()["quiet"]
    fe = SpectrogramFrontend(cfg)
    a = fe.process(x)
    b = fe.process(encode(x))
    np.testing.assert_array_equal(np.asarray(a.spec_padded), np.asarray(b.spec_padded))
