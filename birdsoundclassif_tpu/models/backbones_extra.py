"""Additional backbone families: VGG16-BN and EfficientNet B0-B4 / V2 S/M/L.

The reference exposes these via torchvision with pyramid taps configured in
BackboneBase (reference: backbone.py:77-100, channel table :13-24). Both are
built from scratch here (torchvision-default initialization, weights=None as
in the reference) with the same tap points:

  * vgg16_bn: features indices [12, 22, 32, 42] == post-ReLU of conv2_2,
    conv3_3, conv4_3, conv5_3 -> 4 levels, channels [128, 256, 512, 512]
  * efficientnet_b0..b4: stages [1, 2, 3, 5, 7] -> 5 levels
  * efficientnet_v2_s: stages [1, 2, 3, 5, 7]; v2_m/l: [1, 2, 3, 5, 8]
    (the last tap is the 1x1 head conv, channels 1280)

EfficientNet blocks are MBConv (expand -> depthwise -> SE -> project) and,
for V2's early stages, Fused-MBConv; stochastic depth is identity at eval
and a per-sample Bernoulli residual drop in training.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as fnn

# ---------------------------------------------------------------------------
# VGG16-BN
# ---------------------------------------------------------------------------

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
VGG_CHANNELS = [128, 256, 512, 512]  # reference: backbone.py:14
# post-ReLU taps: conv index (0-based among convs) after which to tap
_VGG_TAP_AFTER_CONV = {3, 6, 9, 12}  # conv2_2, conv3_3, conv4_3, conv5_3


def vgg16_bn_init(key) -> Dict:
    params: Dict = {}
    in_ch = 3
    ki = 0
    keys = jax.random.split(key, 16)
    conv_i = 0
    for v in _VGG16_CFG:
        if v == "M":
            continue
        params[f"conv{conv_i}"] = {
            "w": _tv_conv_w(keys[ki], in_ch, v, 3),
            "b": jnp.zeros((v,), jnp.float32),
        }
        params[f"bn{conv_i}"] = {
            "scale": jnp.ones((v,), jnp.float32),
            "bias": jnp.zeros((v,), jnp.float32),
            "mean": jnp.zeros((v,), jnp.float32),
            "var": jnp.ones((v,), jnp.float32),
        }
        in_ch = v
        conv_i += 1
        ki += 1
    return params


def _tv_conv_w(key, in_ch, out_ch, k, groups=1):
    fan_out = k * k * out_ch // groups
    return jax.random.normal(key, (k, k, in_ch // groups, out_ch), jnp.float32) * math.sqrt(
        2.0 / fan_out
    )


def vgg16_bn_pyramid(params: Dict, x: jnp.ndarray, training=False,
                     bn_updates: Optional[dict] = None) -> List[jnp.ndarray]:
    feats = []
    conv_i = 0
    out = x
    for v in _VGG16_CFG:
        if v == "M":
            out = fnn.max_pool2d(out, 2, 2, 0)
            continue
        out = fnn.conv2d(params[f"conv{conv_i}"], out, padding=1)
        if conv_i == 0 and "stem_corr" in params:
            # fused init_conv border term (optimize.fold_init_conv)
            out = fnn.stem_corr_add(params["stem_corr"], out, x.shape, 1, 1)
        bn = params[f"bn{conv_i}"]
        if training:
            out, stats = fnn.batchnorm(bn, out, training=True)
            if bn_updates is not None:
                bn_updates[f"backbone/body/bn{conv_i}"] = stats
        else:
            out = fnn.batchnorm(bn, out, training=False)
        out = fnn.relu(out)
        if conv_i in _VGG_TAP_AFTER_CONV:  # post-ReLU taps
            feats.append(out)
        conv_i += 1
    return feats


# ---------------------------------------------------------------------------
# EfficientNet
# ---------------------------------------------------------------------------

# B0 stage settings: (expand, kernel, stride, out_ch, repeats)
_EFFNET_B0_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]
# width/depth multipliers per variant
_EFFNET_SCALING = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
}

# V2 stage settings: (block, expand, kernel, stride, out_ch, repeats)
_EFFNET_V2_STAGES = {
    "efficientnet_v2_s": [
        ("fused", 1, 3, 1, 24, 2),
        ("fused", 4, 3, 2, 48, 4),
        ("fused", 4, 3, 2, 64, 4),
        ("mb", 4, 3, 2, 128, 6),
        ("mb", 6, 3, 1, 160, 9),
        ("mb", 6, 3, 2, 256, 15),
    ],
    "efficientnet_v2_m": [
        ("fused", 1, 3, 1, 24, 3),
        ("fused", 4, 3, 2, 48, 5),
        ("fused", 4, 3, 2, 80, 5),
        ("mb", 4, 3, 2, 160, 7),
        ("mb", 6, 3, 1, 176, 14),
        ("mb", 6, 3, 2, 304, 18),
        ("mb", 6, 3, 1, 512, 5),
    ],
    "efficientnet_v2_l": [
        ("fused", 1, 3, 1, 32, 4),
        ("fused", 4, 3, 2, 64, 7),
        ("fused", 4, 3, 2, 96, 7),
        ("mb", 4, 3, 2, 192, 10),
        ("mb", 6, 3, 1, 224, 19),
        ("mb", 6, 3, 2, 384, 25),
        ("mb", 6, 3, 1, 640, 7),
    ],
}

EFFNET_CHANNELS = {  # reference: backbone.py:16-23
    "efficientnet_b0": [16, 24, 40, 112, 320],
    "efficientnet_b1": [16, 24, 40, 112, 320],
    "efficientnet_b2": [16, 24, 48, 120, 352],
    "efficientnet_b3": [24, 32, 48, 136, 384],
    "efficientnet_b4": [24, 32, 56, 160, 448],
    "efficientnet_v2_s": [24, 48, 64, 160, 1280],
    "efficientnet_v2_m": [24, 48, 80, 176, 1280],
    "efficientnet_v2_l": [32, 64, 96, 224, 1280],
}
# taps: stage indices whose output feeds the pyramid (reference: backbone.py:87-100)
_EFFNET_TAPS = {  # 1-based feature-module indices -> our 0-based stage indices
    "b": [0, 1, 2, 4, 6],          # b0-b4: features [1,2,3,5,7]
    "v2_s": [0, 1, 2, 4, "head"],  # v2_s: [1,2,3,5,7] where 7 is the head conv
    "v2_ml": [0, 1, 2, 4, "head"],  # v2_m/l: [1,2,3,5,8], 8 = head conv
}


def _round_channels(ch: float, width_mult: float, divisor: int = 8) -> int:
    ch *= width_mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


def _bn(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def _mbconv_init(key, in_ch, out_ch, expand, kernel, use_se=True, fused=False):
    keys = jax.random.split(key, 6)
    mid = in_ch * expand
    p: Dict = {}
    if fused:
        if expand == 1:
            # torchvision FusedMBConv without expansion is a single
            # Conv2dNormActivation straight to out_ch (no project conv)
            p["fused_conv"] = {"w": _tv_conv_w(keys[0], in_ch, out_ch, kernel)}
            p["fused_bn"] = _bn(out_ch)
            return p
        p["fused_conv"] = {"w": _tv_conv_w(keys[0], in_ch, mid, kernel)}
        p["fused_bn"] = _bn(mid)
    else:
        if expand != 1:
            p["expand_conv"] = {"w": _tv_conv_w(keys[0], in_ch, mid, 1)}
            p["expand_bn"] = _bn(mid)
        p["dw_conv"] = {"w": _tv_conv_w(keys[1], mid, mid, kernel, groups=mid)}
        p["dw_bn"] = _bn(mid)
    if use_se:
        se_ch = max(1, in_ch // 4)
        p["se_reduce"] = fnn.conv2d_init(keys[2], mid, se_ch, 1, init="torch_default")
        p["se_expand"] = fnn.conv2d_init(keys[3], se_ch, mid, 1, init="torch_default")
    p["project_conv"] = {"w": _tv_conv_w(keys[4], mid, out_ch, 1)}
    p["project_bn"] = _bn(out_ch)
    return p


def _apply_bn(p, x, training, bn_updates, path, frozen=False):
    # frozen=True is the reference's norm_layer=FrozenBatchNorm2d carve-out
    # for the efficientnet b0-b4 family (backbone.py:123-131 passes the
    # norm_layer kwarg to every family except vgg / efficientnet_v2):
    # buffers, never batch stats, in train and eval alike
    if frozen:
        return fnn.frozen_batchnorm(p, x)
    if training:
        y, stats = fnn.batchnorm(p, x, training=True)
        if bn_updates is not None:
            bn_updates[path] = stats
        return y
    return fnn.batchnorm(p, x, training=False)


def _mbconv_apply(p, x, stride, kernel, training, bn_updates, path,
                  fused=False, expand=6, frozen=False):
    inp = x
    in_ch = x.shape[-1]
    pad = kernel // 2
    if fused:
        out = fnn.conv2d(p["fused_conv"], x, stride=stride, padding=pad)
        out = fnn.silu(_apply_bn(p["fused_bn"], out, training, bn_updates, path + "/fused_bn", frozen))
    else:
        out = x
        if "expand_conv" in p:
            out = fnn.conv2d(p["expand_conv"], out)
            out = fnn.silu(
                _apply_bn(p["expand_bn"], out, training, bn_updates, path + "/expand_bn", frozen)
            )
        mid = out.shape[-1]
        out = fnn.conv2d(p["dw_conv"], out, stride=stride, padding=pad, groups=mid)
        out = fnn.silu(_apply_bn(p["dw_bn"], out, training, bn_updates, path + "/dw_bn", frozen))
    if "se_reduce" in p:
        se = out.mean(axis=(1, 2), keepdims=True)
        se = fnn.silu(fnn.conv2d(p["se_reduce"], se))
        se = jax.nn.sigmoid(fnn.conv2d(p["se_expand"], se))
        out = out * se
    if "project_conv" in p:  # absent for fused expand==1 (single-conv block)
        out = fnn.conv2d(p["project_conv"], out)
        out = _apply_bn(p["project_bn"], out, training, bn_updates, path + "/project_bn", frozen)
    if stride == 1 and out.shape[-1] == in_ch:
        out = out + inp  # stochastic depth omitted at eval; residual kept
    return out


def efficientnet_block_specs(name: str):
    """Per-block structure mirroring efficientnet_init, for the checkpoint
    converter: list of (stage_idx, block_idx, fused, expand, use_se)."""
    specs = []
    if name.startswith("efficientnet_v2"):
        for si, (block, expand, _k, _s, _out, repeats) in enumerate(
            _EFFNET_V2_STAGES[name]
        ):
            for b in range(repeats):
                specs.append((si, b, block == "fused", expand, block == "mb"))
        return specs
    _wm, dm = _EFFNET_SCALING[name]
    for si, (expand, _k, _s, _out, repeats) in enumerate(_EFFNET_B0_STAGES):
        for b in range(_round_repeats(repeats, dm)):
            specs.append((si, b, False, expand, True))
    return specs


def efficientnet_init(key, name: str) -> Dict:
    params: Dict = {}
    if name.startswith("efficientnet_v2"):
        stages = _EFFNET_V2_STAGES[name]
        stem_ch = stages[0][4]
        head_ch = 1280
        keys = jax.random.split(key, 2 + len(stages))
        params["stem_conv"] = {"w": _tv_conv_w(keys[0], 3, stem_ch, 3)}
        params["stem_bn"] = _bn(stem_ch)
        in_ch = stem_ch
        for si, (block, expand, k, stride, out_ch, repeats) in enumerate(stages):
            bkeys = jax.random.split(keys[1 + si], repeats)
            blocks = {}
            for b in range(repeats):
                blocks[str(b)] = _mbconv_init(
                    bkeys[b], in_ch, out_ch, expand, k,
                    use_se=(block == "mb"), fused=(block == "fused"),
                )
                in_ch = out_ch
            params[f"stage{si}"] = blocks
        params["head_conv"] = {"w": _tv_conv_w(keys[-1], in_ch, head_ch, 1)}
        params["head_bn"] = _bn(head_ch)
        return params
    # b0-b4
    wm, dm = _EFFNET_SCALING[name]
    stem_ch = _round_channels(32, wm)
    keys = jax.random.split(key, 1 + len(_EFFNET_B0_STAGES))
    params["stem_conv"] = {"w": _tv_conv_w(keys[0], 3, stem_ch, 3)}
    params["stem_bn"] = _bn(stem_ch)
    in_ch = stem_ch
    for si, (expand, k, stride, out_ch, repeats) in enumerate(_EFFNET_B0_STAGES):
        out_ch = _round_channels(out_ch, wm)
        repeats = _round_repeats(repeats, dm)
        bkeys = jax.random.split(keys[1 + si], repeats)
        blocks = {}
        for b in range(repeats):
            blocks[str(b)] = _mbconv_init(bkeys[b], in_ch, out_ch, expand, k)
            in_ch = out_ch
        params[f"stage{si}"] = blocks
    return params


def efficientnet_pyramid(params: Dict, x: jnp.ndarray, name: str,
                         training=False, bn_updates=None,
                         frozen=False) -> List[jnp.ndarray]:
    """frozen=True replaces every BN with FrozenBatchNorm semantics — the
    reference's norm_layer kwarg for the b0-b4 family under
    norm_layer_backbone='frozen_batchnorm' (backbone.py:123-131); the v2
    family is exempt there, so callers pass frozen=False for v2."""
    feats: List[jnp.ndarray] = []
    out = fnn.conv2d(params["stem_conv"], x, stride=2, padding=1)
    if "stem_corr" in params:
        # fused init_conv border term (optimize.fold_init_conv)
        out = fnn.stem_corr_add(params["stem_corr"], out, x.shape, 2, 1)
    out = fnn.silu(_apply_bn(params["stem_bn"], out, training, bn_updates,
                             "backbone/body/stem_bn", frozen))
    if name.startswith("efficientnet_v2"):
        stages = _EFFNET_V2_STAGES[name]
        taps = {0, 1, 2, 4}
        for si, (block, expand, k, stride, out_ch, repeats) in enumerate(stages):
            blocks = params[f"stage{si}"]
            for b in range(len(blocks)):
                s = stride if b == 0 else 1
                out = _mbconv_apply(
                    blocks[str(b)], out, s, k, training, bn_updates,
                    f"backbone/body/stage{si}/{b}", fused=(block == "fused"),
                    frozen=frozen,
                )
            if si in taps:
                feats.append(out)
        out = fnn.conv2d(params["head_conv"], out)
        out = fnn.silu(_apply_bn(params["head_bn"], out, training, bn_updates,
                                 "backbone/body/head_bn", frozen))
        feats.append(out)
        return feats
    wm, dm = _EFFNET_SCALING[name]
    taps = {0, 1, 2, 4, 6}
    for si, (expand, k, stride, out_ch, repeats) in enumerate(_EFFNET_B0_STAGES):
        blocks = params[f"stage{si}"]
        for b in range(len(blocks)):
            s = stride if b == 0 else 1
            out = _mbconv_apply(
                blocks[str(b)], out, s, k, training, bn_updates,
                f"backbone/body/stage{si}/{b}", frozen=frozen,
            )
        if si in taps:
            feats.append(out)
    return feats
