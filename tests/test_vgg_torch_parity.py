"""VGG16-BN backbone activation parity vs a torch reconstruction of
torchvision's vgg16_bn.features (reference taps: backbone.py:78-80,
features indices [12, 22, 32, 42]), through the converter's vgg key map."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbones_extra import (
    _VGG16_CFG,
    vgg16_bn_init,
    vgg16_bn_pyramid,
)
from birdsoundclassif_tpu.models.torch_convert import (
    params_to_state_dict,
    state_dict_to_params,
)

_TAPS = [12, 22, 32, 42]


def _torch_vgg16_bn_features() -> tnn.Sequential:
    """torchvision make_layers(cfg D, batch_norm=True) layout."""
    layers, in_ch = [], 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.BatchNorm2d(v),
                       tnn.ReLU(inplace=True)]
            in_ch = v
    return tnn.Sequential(*layers)


def _vgg_cfg() -> NbmConfig:
    cfg = NbmConfig()
    cfg.backbone = "vgg16_bn"
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    return cfg


def test_vgg16_bn_activation_parity(rng):
    cfg = _vgg_cfg()
    from torch_oracles import randomize_bn_stats

    body = vgg16_bn_init(jax.random.PRNGKey(0))
    randomize_bn_stats(body, rng)
    params = {"backbone": {"body": body}}
    sd = params_to_state_dict(params, cfg)

    model = _torch_vgg16_bn_features()
    mapped = {}
    for k, v in sd.items():
        if k.startswith("backbone.0.body."):
            mapped[k[len("backbone.0.body."):]] = torch.tensor(v)
    missing, unexpected = model.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    x = rng.normal(size=(2, 3, 48, 64)).astype(np.float32)
    model.eval()
    want = []
    with torch.no_grad():
        out = torch.tensor(x)
        for i, layer in enumerate(model):
            out = layer(out)
            if i in _TAPS:
                want.append(out.numpy())
    assert len(want) == 4

    got = vgg16_bn_pyramid(params["backbone"]["body"],
                           jnp.asarray(np.moveaxis(x, 1, -1)), training=False)
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(g), -1, 1), w, rtol=1e-4, atol=1e-4
        )


def test_vgg_converter_roundtrip():
    cfg = _vgg_cfg()
    params = {"backbone": {"body": vgg16_bn_init(jax.random.PRNGKey(5))}}
    back = state_dict_to_params(params_to_state_dict(params, cfg), cfg)
    flat_a = jax.tree_util.tree_leaves(params["backbone"]["body"])
    flat_b = jax.tree_util.tree_leaves(back["backbone"]["body"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
