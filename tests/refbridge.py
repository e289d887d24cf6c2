"""Bridge to the GENUINE reference implementation at /root/reference.

Parity tests elsewhere in this suite compare against hand-transcribed
oracles (tests/torch_oracles.py).  This module closes the remaining gap by
importing the *actual* reference modules (nets/layers.py, nets_utils.py,
self_attention.py, fpn.py, position_encoding.py, head.py, nbm_model.py,
run_detection.py, prepare_dataset.py) so tests can drive the real
``ProposalLayer`` / ``ROIPooling`` / ``FastRCNN`` / ... code with weights
exported through ``torch_convert.params_to_state_dict``.

The reference imports four third-party packages absent from this image.
Minimal stand-ins are installed in ``sys.modules`` before the import:

* ``torchvision`` — only what ``nets/backbone.py:6-8,131`` touches:
  ``models._utils.IntermediateLayerGetter`` (rewritten from the documented
  torchvision API) and ``models.resnet50`` (the Bottleneck topology
  reconstruction anchored against torchvision's published parameter count
  in tests/test_oracle_validity.py, here parameterized by ``norm_layer``
  exactly like the real factory so the reference's FrozenBatchNorm2d is
  honored).
* ``librosa`` — ``core.load`` via our RIFF parser (librosa.load semantics,
  audio/wavio.py) and ``stft`` as the centered periodic-hann rFFT oracle
  cross-validated against torch.stft and scipy.signal.ShortTimeFFT in
  tests/test_oracle_validity.py (reference: prepare_dataset.py:233-252).
* ``soundfile`` — ``write`` only (long-file split path,
  prepare_dataset.py:199); implemented with the stdlib wave module.
* ``ffmpeg`` — import-time placeholder; nothing on the tested paths calls
  it (utils.py:2 imports it module-level).

Nothing here copies reference code; it only *executes* it read-only.
"""

from __future__ import annotations

import importlib
import sys
import types
from collections import OrderedDict

import numpy as np
import torch
import torch.nn as tnn

REF_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# torchvision stand-in
# ---------------------------------------------------------------------------


class IntermediateLayerGetter(tnn.ModuleDict):
    """Documented torchvision.models._utils.IntermediateLayerGetter API:
    keep the model's children (in registration order) up to the last
    requested layer; forward returns {out_name: activation}."""

    def __init__(self, model: tnn.Module, return_layers):
        remaining = set(return_layers)
        if not remaining.issubset({name for name, _ in model.named_children()}):
            raise ValueError("return_layers are not present in model")
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            remaining.discard(name)
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = dict(return_layers)

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


class _Bottleneck(tnn.Module):
    """torchvision resnet Bottleneck topology (state_dict-key compatible),
    parameterized by norm_layer like the real constructor."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=tnn.BatchNorm2d):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(tnn.Module):
    """torchvision-resnet-compatible body + head; the class NAME matters:
    the reference dispatches on it (backbone.py:65-66,82)."""

    def __init__(self, layers, norm_layer=tnn.BatchNorm2d,
                 replace_stride_with_dilation=None, num_classes=1000):
        super().__init__()
        if replace_stride_with_dilation and any(replace_stride_with_dilation):
            raise NotImplementedError("dilation not supported by the stub")
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for name, planes, blocks, stride in [
            ("layer1", 64, layers[0], 1), ("layer2", 128, layers[1], 2),
            ("layer3", 256, layers[2], 2), ("layer4", 512, layers[3], 2),
        ]:
            mods = []
            ds = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                norm_layer(planes * 4),
            )
            mods.append(_Bottleneck(inplanes, planes, stride, ds, norm_layer))
            inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(_Bottleneck(inplanes, planes, norm_layer=norm_layer))
            setattr(self, name, tnn.Sequential(*mods))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512 * 4, num_classes)

    def forward(self, x):  # pragma: no cover - reference wraps with ILG
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for name in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(self, name)(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _resnet50(norm_layer=tnn.BatchNorm2d, replace_stride_with_dilation=None,
              **kwargs):
    return ResNet([3, 4, 6, 3], norm_layer=norm_layer,
                  replace_stride_with_dilation=replace_stride_with_dilation)


def _install_torchvision():
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")
    _utils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = _utils
    models.resnet50 = _resnet50
    tv.models = models
    ops = types.ModuleType("torchvision.ops")
    ops_boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        # torchvision.ops.boxes.box_area (used by the reference's dead DETR
        # GIoU path, box_ops.py:6)
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    ops_boxes.box_area = box_area
    ops.boxes = ops_boxes
    tv.ops = ops
    tv.__stub__ = True
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", models)
    sys.modules.setdefault("torchvision.models._utils", _utils)
    sys.modules.setdefault("torchvision.ops", ops)
    sys.modules.setdefault("torchvision.ops.boxes", ops_boxes)


# ---------------------------------------------------------------------------
# librosa / soundfile / ffmpeg stand-ins
# ---------------------------------------------------------------------------


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def _librosa_stft(y, n_fft=2048, hop_length=None, **kwargs):
    """librosa.stft semantics (center=True, zero pad, periodic hann) —
    the formula cross-validated in tests/test_oracle_validity.py, kept
    complex here because the reference takes np.abs itself."""
    if hop_length is None:
        hop_length = n_fft // 4
    y = np.asarray(y)
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float64), pad, mode="constant")
    n_frames = 1 + len(y) // hop_length
    win = _hann_periodic(n_fft)
    frames = np.stack(
        [yp[t * hop_length:t * hop_length + n_fft] for t in range(n_frames)]
    )
    out = np.fft.rfft(frames * win, axis=1).T
    # librosa returns complex64 for float32 input
    return out.astype(np.complex64) if y.dtype == np.float32 else out


def _librosa_load(path, sr=None, **kwargs):
    import os

    sys.path.insert(0, "/root/repo")
    from birdsoundclassif_tpu.audio.wavio import read_wav, resample

    data, native_sr = read_wav(os.fspath(path))
    if sr is not None and sr != native_sr:
        data = resample(data, native_sr, sr)
        native_sr = sr
    return data, native_sr


def _soundfile_write(path, data, samplerate, **kwargs):
    import wave

    x = np.asarray(data)
    if x.dtype != np.int16:
        x = np.clip(np.round(np.asarray(x, np.float64) * 32768.0),
                    -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(samplerate))
        w.writeframes(x.tobytes())


def _install_audio_stubs():
    lb = types.ModuleType("librosa")
    core = types.ModuleType("librosa.core")
    core.load = _librosa_load
    lb.core = core
    lb.load = _librosa_load
    lb.stft = _librosa_stft
    lb.__stub__ = True
    sys.modules.setdefault("librosa", lb)
    sys.modules.setdefault("librosa.core", core)

    sf = types.ModuleType("soundfile")
    sf.write = _soundfile_write
    sf.__stub__ = True
    sys.modules.setdefault("soundfile", sf)

    ff = types.ModuleType("ffmpeg")
    ff.__stub__ = True
    sys.modules.setdefault("ffmpeg", ff)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

_cache = {}


def install_stubs():
    _install_torchvision()
    _install_audio_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def ref(name: str):
    """Import and return a genuine reference module, e.g. ref('nets.layers').

    Names are relative to the nbm_model namespace package."""
    if name in _cache:
        return _cache[name]
    install_stubs()
    mod = importlib.import_module(f"nbm_model.{name}")
    _cache[name] = mod
    return mod


def make_ref_args(cfg, **overrides):
    """Reference-style args namespace from our NbmConfig (the reference
    reloads its argparse dump the same way, run_detection.py:89-99)."""
    nets_utils = ref("nets.util.nets_utils")

    class Args:
        pass

    a = Args()
    for k, v in vars(cfg).items():
        setattr(a, k, v)
    a.device = "cpu"  # reference modules .to(config.device) their tensors
    nets_utils.setattr_others(a)
    # overrides win over the derived fields (setattr_others re-derives
    # top_size/ratios/scales, so they must be applied after it)
    for k, v in overrides.items():
        setattr(a, k, v)
    return a
