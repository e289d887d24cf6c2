"""Activation-level backbone parity: our JAX ResNet vs a torch model built with
torchvision's exact module structure and fed OUR weights through the
checkpoint-converter mapping. Validates both the conv stack numerics and the
torch key map end-to-end (torchvision itself is not installed; the Bottleneck
topology is reconstructed here from its published definition)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbone import backbone_init, backbone_apply
from birdsoundclassif_tpu.models.torch_convert import params_to_state_dict


class FrozenBN(tnn.Module):
    """reference FrozenBatchNorm2d (backbone.py:26-62)."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        scale = self.weight.reshape(1, -1, 1, 1) * (
            self.running_var.reshape(1, -1, 1, 1) + 1e-5
        ).rsqrt()
        bias = self.bias.reshape(1, -1, 1, 1) - self.running_mean.reshape(1, -1, 1, 1) * scale
        return x * scale + bias


class Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = FrozenBN(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = FrozenBN(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBN(planes * 4)
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


class TorchResNet50Body(tnn.Module):
    """torchvision resnet50 topology with the same state_dict key names."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBN(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for name, planes, blocks, stride in [
            ("layer1", 64, 3, 1), ("layer2", 128, 4, 2),
            ("layer3", 256, 6, 2), ("layer4", 512, 3, 2),
        ]:
            layers = []
            ds = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                FrozenBN(planes * 4),
            )
            layers.append(Bottleneck(inplanes, planes, stride, ds))
            inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(inplanes, planes))
            setattr(self, name, tnn.Sequential(*layers))

    def forward(self, x):
        taps = []
        x = self.relu(self.bn1(self.conv1(x)))
        taps.append(x)
        x = self.maxpool(x)
        for name in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(self, name)(x)
            taps.append(x)
        return taps


@pytest.mark.parametrize("hw", [(96, 128)])
def test_resnet50_activation_parity(rng, hw):
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    key = jax.random.PRNGKey(0)
    params = backbone_init(key, cfg)
    # randomize BN stats so the frozen-BN math is actually exercised
    def jiggle(p, path=""):
        for k, v in p.items():
            if isinstance(v, dict):
                jiggle(v, path + "/" + k)
            elif k in ("mean",):
                p[k] = jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))
            elif k in ("var",):
                p[k] = jnp.asarray((1 + np.abs(rng.normal(0, 0.2, v.shape))).astype(np.float32))
    jiggle(params["body"])

    sd = params_to_state_dict({"backbone": params}, cfg)
    body = TorchResNet50Body()
    torch_sd = {
        k[len("backbone.0.body."):]: torch.tensor(v)
        for k, v in sd.items() if k.startswith("backbone.0.body.")
    }
    # torchvision downsample keys: downsample.0 (conv) / downsample.1 (bn)
    missing, unexpected = body.load_state_dict(torch_sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    h, w = hw
    x = rng.normal(size=(1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in body(torch.tensor(x))]

    x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
    # feed 3-channel input directly (no init_conv in this test path)
    from birdsoundclassif_tpu.models.backbone import resnet_pyramid

    got = resnet_pyramid(params["body"], x_nhwc, "resnet50", "frozen_batchnorm")
    assert len(got) == len(want)
    for i, (g, t) in enumerate(zip(got, want)):
        g = np.moveaxis(np.asarray(g), -1, 1)
        np.testing.assert_allclose(g, t, rtol=1e-3, atol=1e-3,
                                   err_msg=f"level {i}")
