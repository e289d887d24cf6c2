"""Oracle-validity cross-checks (VERDICT r1 missing #2).

torchvision and librosa are not installable in this image, so the parity
tests reconstruct their behavior by hand. These tests anchor those
reconstructions against independent implementations and published
constants, so a reconstruction error fails here rather than silently
validating a wrong JAX stack:

1. The numpy "librosa-semantics" STFT oracle (tests/test_frontend.py) is
   cross-validated against TWO independent STFT implementations shipped in
   this image — torch.stft and scipy.signal.ShortTimeFFT — configured with
   librosa.stft's documented conventions (n_fft-length periodic hann,
   center=True, constant padding; reference: prepare_dataset.py:233-252).
2. The torch backbone reconstructions (tests/test_*_torch_parity.py) are
   anchored against torchvision's published parameter counts — resnet50
   25,557,032 / vgg16_bn 138,365,992 / efficientnet_b0 5,288,548 total
   trainable parameters — so a topology drift (wrong widths, missing
   block) breaks the count even though torchvision itself is absent.
"""

import numpy as np
import torch
import pytest

from test_frontend import hann_periodic, stft_mag_oracle


# ---------------------------------------------------------------------------
# 1. STFT oracle vs torch.stft and scipy ShortTimeFFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n_fft,hop,n",
    [
        (80, 24, 7_000),        # tiny test geometry (test_frontend.TINY)
        (1324, 132, 44_100),    # flagship geometry: 1 s at 44.1 kHz
    ],
)
def test_stft_oracle_matches_torch_stft(rng, n_fft, hop, n):
    y = rng.standard_normal(n)
    ours = stft_mag_oracle(y, n_fft, hop)

    win = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    got = torch.stft(
        torch.tensor(y), n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=win, center=True, pad_mode="constant", onesided=True,
        return_complex=True,
    ).abs().numpy()
    assert got.shape == ours.shape == (n_fft // 2 + 1, 1 + n // hop)
    np.testing.assert_allclose(got, ours, atol=1e-10)


@pytest.mark.parametrize(
    "n_fft,hop,n",
    [
        (80, 24, 7_000),
        (1324, 132, 44_100),
    ],
)
def test_stft_oracle_matches_scipy_shorttimefft(rng, n_fft, hop, n):
    from scipy.signal import ShortTimeFFT, get_window

    y = rng.standard_normal(n)
    ours = stft_mag_oracle(y, n_fft, hop)

    w = get_window("hann", n_fft, fftbins=True).astype(np.float64)
    # periodic hann two ways must agree before we use it
    np.testing.assert_allclose(w, hann_periodic(n_fft), atol=1e-12)

    sft = ShortTimeFFT(w, hop=hop, fs=1.0, fft_mode="onesided",
                       phase_shift=None)
    S = sft.stft(y, padding="zeros")
    k0 = -sft.p_min  # scipy emits frames before t=0; librosa starts at t=0
    got = np.abs(S[:, k0:k0 + ours.shape[1]])
    assert got.shape == ours.shape
    np.testing.assert_allclose(got, ours, atol=1e-10)


# ---------------------------------------------------------------------------
# 2. torch reconstructions vs published torchvision parameter counts
# ---------------------------------------------------------------------------


def _affine_buffer_count(model: torch.nn.Module) -> int:
    """FrozenBN reconstructions register scale/shift as buffers; torchvision
    counts them as parameters, so add weight/bias buffers (but not running
    stats) to the trainable-parameter count."""
    return sum(
        b.numel()
        for name, b in model.named_buffers()
        if name.endswith((".weight", ".bias"))
    )


def test_resnet50_reconstruction_param_count():
    from test_backbone_torch_parity import TorchResNet50Body

    body = TorchResNet50Body()
    n = sum(p.numel() for p in body.parameters()) + _affine_buffer_count(body)
    # torchvision resnet50: 25,557,032 total, of which the fc head is
    # 2048*1000 + 1000 = 2,049,000 -> body (conv1..layer4) = 23,508,032
    assert n == 25_557_032 - 2_049_000


def test_vgg16_bn_reconstruction_param_count():
    from test_vgg_torch_parity import _torch_vgg16_bn_features

    feats = _torch_vgg16_bn_features()
    n = sum(p.numel() for p in feats.parameters()) + _affine_buffer_count(feats)
    # torchvision vgg16_bn: 138,365,992 total; classifier = 25088*4096+4096
    # + 4096*4096+4096 + 4096*1000+1000 = 123,642,856 -> features 14,723,136
    assert n == 138_365_992 - 123_642_856


def test_efficientnet_b0_reconstruction_param_count():
    import torch.nn as tnn
    from test_effnet_torch_parity import MBConv, _cna, _EFFNET_B0_STAGES

    stem = _cna(3, 32, 3, 2)
    stages = []
    in_ch = 32
    for expand, k, stride, out_ch, repeats in _EFFNET_B0_STAGES:
        blocks = []
        for bi in range(repeats):
            blocks.append(MBConv(in_ch, out_ch, expand, k, stride if bi == 0 else 1))
            in_ch = out_ch
        stages.append(tnn.Sequential(*blocks))
    feats = tnn.Sequential(stem, *stages)
    n = sum(p.numel() for p in feats.parameters()) + _affine_buffer_count(feats)
    # torchvision efficientnet_b0: 5,288,548 total; classifier =
    # 1280*1000 + 1000 = 1,281,000; final 1x1 head conv (320->1280 + BN) =
    # 320*1280*1 + 2*1280 = 412,160 (not part of the backbone taps)
    assert n == 5_288_548 - 1_281_000 - 412_160
