"""EfficientNet backbone activation parity vs torch reconstructions of
torchvision's blocks (reference uses torchvision efficientnet_b0..b4 /
v2_{s,m,l} via IntermediateLayerGetter, backbone.py:87-100), through the
converter's efficientnet key map.

Covers: full efficientnet_b0 pyramid (5 taps), FusedMBConv unit parity for
both the expand!=1 (conv+project) and expand==1 (single-conv) shapes, and
the converter round trip for a v2 variant."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbones_extra import (
    _EFFNET_B0_STAGES,
    _mbconv_apply,
    _mbconv_init,
    efficientnet_init,
    efficientnet_pyramid,
)
from birdsoundclassif_tpu.models.torch_convert import (
    params_to_state_dict,
    state_dict_to_params,
)


def _cna(in_ch, out_ch, k, stride, groups=1, act=True):
    layers = [
        tnn.Conv2d(in_ch, out_ch, k, stride, padding=k // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(out_ch),
    ]
    if act:
        layers.append(tnn.SiLU(inplace=True))
    return tnn.Sequential(*layers)


class SE(tnn.Module):
    """torchvision SqueezeExcitation (SiLU activation, sigmoid scale)."""

    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(F.silu(self.fc1(s))))
        return x * s


class MBConv(tnn.Module):
    def __init__(self, in_ch, out_ch, expand, k, stride):
        super().__init__()
        mid = in_ch * expand
        layers = []
        if expand != 1:
            layers.append(_cna(in_ch, mid, 1, 1))
        layers.append(_cna(mid, mid, k, stride, groups=mid))
        layers.append(SE(mid, max(1, in_ch // 4)))
        layers.append(_cna(mid, out_ch, 1, 1, act=False))
        self.block = tnn.Sequential(*layers)
        self.use_res = stride == 1 and in_ch == out_ch

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class FusedMBConv(tnn.Module):
    def __init__(self, in_ch, out_ch, expand, k, stride):
        super().__init__()
        mid = in_ch * expand
        if expand != 1:
            layers = [_cna(in_ch, mid, k, stride), _cna(mid, out_ch, 1, 1, act=False)]
        else:
            layers = [_cna(in_ch, out_ch, k, stride)]
        self.block = tnn.Sequential(*layers)
        self.use_res = stride == 1 and in_ch == out_ch

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


from torch_oracles import randomize_bn_stats as _randomize_bn_stats


def test_efficientnet_b0_activation_parity(rng):
    cfg = NbmConfig()
    cfg.backbone = "efficientnet_b0"
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    body = efficientnet_init(jax.random.PRNGKey(0), "efficientnet_b0")
    _randomize_bn_stats(body, rng)
    params = {"backbone": {"body": body}}
    sd = params_to_state_dict(params, cfg)

    stem = _cna(3, 32, 3, 2)
    stages = []
    in_ch = 32
    for expand, k, stride, out_ch, repeats in _EFFNET_B0_STAGES:
        blocks = []
        for bi in range(repeats):
            blocks.append(MBConv(in_ch, out_ch, expand, k, stride if bi == 0 else 1))
            in_ch = out_ch
        stages.append(tnn.Sequential(*blocks))
    features = tnn.Sequential(stem, *stages)

    mapped = {}
    for key, v in sd.items():
        if key.startswith("backbone.0.body."):
            mapped[key[len("backbone.0.body."):]] = torch.tensor(v)
    missing, unexpected = features.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    features.eval()
    want = []
    with torch.no_grad():
        out = torch.tensor(x)
        for i, layer in enumerate(features):
            out = layer(out)
            if i in (1, 2, 3, 5, 7):  # reference taps, backbone.py:98-100
                want.append(out.numpy())
    assert len(want) == 5

    got = efficientnet_pyramid(params["backbone"]["body"],
                               jnp.asarray(np.moveaxis(x, 1, -1)),
                               "efficientnet_b0", training=False)
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(g), -1, 1), w, rtol=1e-3, atol=1e-4
        )


def _unit_fused_parity(rng, in_ch, out_ch, expand, k, stride):
    p = _mbconv_init(jax.random.PRNGKey(1), in_ch, out_ch, expand, k,
                     use_se=False, fused=True)
    _randomize_bn_stats(p, rng)
    ref = FusedMBConv(in_ch, out_ch, expand, k, stride)
    sd = {}
    if expand != 1:
        sd["block.0.0.weight"] = np.moveaxis(np.asarray(p["fused_conv"]["w"]),
                                             (0, 1, 2, 3), (2, 3, 1, 0))
        sd["block.1.0.weight"] = np.moveaxis(np.asarray(p["project_conv"]["w"]),
                                             (0, 1, 2, 3), (2, 3, 1, 0))
        bns = [("block.0.1", p["fused_bn"]), ("block.1.1", p["project_bn"])]
    else:
        sd["block.0.0.weight"] = np.moveaxis(np.asarray(p["fused_conv"]["w"]),
                                             (0, 1, 2, 3), (2, 3, 1, 0))
        bns = [("block.0.1", p["fused_bn"])]
    for prefix, bn in bns:
        sd[prefix + ".weight"] = np.asarray(bn["scale"])
        sd[prefix + ".bias"] = np.asarray(bn["bias"])
        sd[prefix + ".running_mean"] = np.asarray(bn["mean"])
        sd[prefix + ".running_var"] = np.asarray(bn["var"])
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    x = rng.normal(size=(2, in_ch, 16, 16)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = _mbconv_apply(p, jnp.asarray(np.moveaxis(x, 1, -1)), stride, k,
                        False, None, "t", fused=True, expand=expand)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_fused_mbconv_expand4_parity(rng):
    _unit_fused_parity(rng, 24, 48, 4, 3, 2)


def test_fused_mbconv_expand1_single_conv_parity(rng):
    """expand==1 fused block is a single CNA with residual (torchvision
    FusedMBConv without expansion)."""
    _unit_fused_parity(rng, 24, 24, 1, 3, 1)


def test_efficientnet_v2_s_activation_parity(rng):
    """Full efficientnet_v2_s pyramid (5 taps incl. the 1280-ch head conv)
    vs a torch reconstruction of torchvision's FusedMBConv/MBConv stages,
    loaded through the converter's state-dict layout (reference tap indices
    [1,2,3,5,7], backbone.py:87-100)."""
    cfg = NbmConfig()
    cfg.backbone = "efficientnet_v2_s"
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    body = efficientnet_init(jax.random.PRNGKey(2), "efficientnet_v2_s")
    _randomize_bn_stats(body, rng)
    params = {"backbone": {"body": body}}
    sd = params_to_state_dict(params, cfg)

    from birdsoundclassif_tpu.models.backbones_extra import _EFFNET_V2_STAGES

    stem = _cna(3, 24, 3, 2)
    stages = []
    in_ch = 24
    for block, expand, k, stride, out_ch, repeats in \
            _EFFNET_V2_STAGES["efficientnet_v2_s"]:
        mod = FusedMBConv if block == "fused" else MBConv
        blocks = []
        for bi in range(repeats):
            blocks.append(mod(in_ch, out_ch, expand, k, stride if bi == 0 else 1))
            in_ch = out_ch
        stages.append(tnn.Sequential(*blocks))
    head = _cna(in_ch, 1280, 1, 1)
    features = tnn.Sequential(stem, *stages, head)

    mapped = {}
    for key, v in sd.items():
        if key.startswith("backbone.0.body."):
            mapped[key[len("backbone.0.body."):]] = torch.tensor(v)
    missing, unexpected = features.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    features.eval()
    want = []
    with torch.no_grad():
        out = torch.tensor(x)
        for i, layer in enumerate(features):
            out = layer(out)
            if i in (1, 2, 3, 5, 7):  # reference taps for v2_s
                want.append(out.numpy())
    assert len(want) == 5

    got = efficientnet_pyramid(params["backbone"]["body"],
                               jnp.asarray(np.moveaxis(x, 1, -1)),
                               "efficientnet_v2_s", training=False)
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(g), -1, 1), w, rtol=1e-3, atol=1e-4
        )


def test_effnet_v2_converter_roundtrip():
    cfg = NbmConfig()
    cfg.backbone = "efficientnet_v2_s"
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    params = {"backbone": {"body": efficientnet_init(jax.random.PRNGKey(5),
                                                     "efficientnet_v2_s")}}
    back = state_dict_to_params(params_to_state_dict(params, cfg), cfg)
    flat_a = sorted(
        jax.tree_util.tree_flatten_with_path(params["backbone"]["body"])[0],
        key=lambda kv: str(kv[0]),
    )
    flat_b_tree = back["backbone"]["body"]
    flat_b = sorted(
        jax.tree_util.tree_flatten_with_path(flat_b_tree)[0],
        key=lambda kv: str(kv[0]),
    )
    assert [str(k) for k, _ in flat_a] == [str(k) for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
