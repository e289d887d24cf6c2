"""Bottleneck-ResNet backbone (NHWC, frozen-BN default) with pyramid taps.

Reimplements the torchvision backbone wrapper of the reference
(reference: backbone.py:69-159): a 1x1 ``init_conv`` adapts 1-channel
spectrograms to 3 channels, the stem + 4 stages are tapped after
[relu, layer1..layer4] (5 levels at strides 2/4/8/16/32, channels
64/256/512/1024/2048), and each level gets a sine positional embedding
(the ``Joiner``). ``dilation`` swaps layer4's stride for dilation-2.

Note the reference builds torchvision models with ``weights=None`` —
i.e. it trains the backbone from scratch — so torchvision-default
initialization (kaiming fan_out, BN gamma=1) is reproduced here and no
pretrained weights are required for capability parity.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import nn as fnn
from ..ops.posenc import sine_position_embedding_2d

RESNET_SPECS = {
    "resnet50": dict(layers=(3, 4, 6, 3), groups=1, width_per_group=64),
    "resnet101": dict(layers=(3, 4, 23, 3), groups=1, width_per_group=64),
    "resnet152": dict(layers=(3, 8, 36, 3), groups=1, width_per_group=64),
    "resnext101_32x8d": dict(layers=(3, 4, 23, 3), groups=32, width_per_group=8),
}

RESNET_CHANNELS = [64, 256, 512, 1024, 2048]  # reference: backbone.py:15


def _tv_conv_init(key, in_ch, out_ch, kernel, groups=1):
    """torchvision resnet conv init: kaiming_normal_(fan_out, relu), no bias."""
    kh = kw = kernel if isinstance(kernel, int) else kernel[0]
    fan_out = kh * kw * out_ch // groups
    std = math.sqrt(2.0 / fan_out)
    return {"w": jax.random.normal(key, (kh, kw, in_ch // groups, out_ch), jnp.float32) * std}


def _bn_init(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def _bottleneck_init(key, in_ch, planes, stride, groups, width_per_group, has_downsample):
    width = int(planes * (width_per_group / 64.0)) * groups
    keys = jax.random.split(key, 4)
    p = {
        "conv1": _tv_conv_init(keys[0], in_ch, width, 1),
        "bn1": _bn_init(width),
        "conv2": _tv_conv_init(keys[1], width, width, 3, groups),
        "bn2": _bn_init(width),
        "conv3": _tv_conv_init(keys[2], width, planes * 4, 1),
        "bn3": _bn_init(planes * 4),
    }
    if has_downsample:
        p["downsample"] = {
            "conv": _tv_conv_init(keys[3], in_ch, planes * 4, 1),
            "bn": _bn_init(planes * 4),
        }
    return p


def resnet_init(key, name: str = "resnet50") -> Dict:
    spec = RESNET_SPECS[name]
    keys = jax.random.split(key, 8)
    params: Dict = {
        "conv1": _tv_conv_init(keys[0], 3, 64, 7),
        "bn1": _bn_init(64),
    }
    in_ch = 64
    for stage, n_blocks in enumerate(spec["layers"]):
        planes = 64 * (2 ** stage)
        blocks = {}
        bkeys = jax.random.split(keys[1 + stage], n_blocks)
        for b in range(n_blocks):
            stride = 1 if (stage == 0 or b > 0) else 2
            has_ds = b == 0  # stage 0 block 0 changes channels (64 -> 256)
            blocks[str(b)] = _bottleneck_init(
                bkeys[b], in_ch, planes, stride, spec["groups"],
                spec["width_per_group"], has_ds,
            )
            in_ch = planes * 4
        params[f"layer{stage + 1}"] = blocks
    return params


def _norm(params, x, kind: str, training: bool, bn_updates=None, path=""):
    if kind == "frozen_batchnorm":
        return fnn.frozen_batchnorm(params, x)
    if training:
        y, stats = fnn.batchnorm(params, x, training=True)
        if bn_updates is not None:
            bn_updates[path] = stats
        return y
    return fnn.batchnorm(params, x, training=False)


def _bottleneck_apply(
    p, x, stride, dilation, groups, norm_kind, training, bn_updates, path
):
    idn = x
    out = fnn.conv2d(p["conv1"], x)
    out = fnn.relu(_norm(p["bn1"], out, norm_kind, training, bn_updates, path + "/bn1"))
    out = fnn.conv2d(
        p["conv2"], out, stride=stride, padding=dilation, groups=groups, dilation=dilation
    )
    out = fnn.relu(_norm(p["bn2"], out, norm_kind, training, bn_updates, path + "/bn2"))
    out = fnn.conv2d(p["conv3"], out)
    out = _norm(p["bn3"], out, norm_kind, training, bn_updates, path + "/bn3")
    if "downsample" in p:
        idn = fnn.conv2d(p["downsample"]["conv"], x, stride=stride)
        idn = _norm(
            p["downsample"]["bn"], idn, norm_kind, training, bn_updates,
            path + "/downsample/bn",
        )
    return fnn.relu(out + idn)


def resnet_pyramid(
    params: Dict,
    x: jnp.ndarray,
    name: str = "resnet50",
    norm_kind: str = "frozen_batchnorm",
    dilation: bool = False,
    training: bool = False,
    bn_updates: Optional[dict] = None,
    remat: str = "none",
) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) -> 5 feature maps [relu, layer1..layer4]
    (reference tap points: backbone.py:82-85).

    remat: segmented rematerialization granularity —
      "blocks": each bottleneck in its own jax.checkpoint, so the backward
        pass keeps only block-boundary activations live plus one block's
        internals (vs the whole trunk's residuals for a single outer
        checkpoint). Lowest peak HBM, but the many-region HLO is expensive
        to compile (the remote compile helper fails above B=8 on v5e).
      "stages": one jax.checkpoint per resnet stage (4 regions) — peak is
        stage boundaries plus one stage's internals; compiles like the
        plain program. Same ~one-extra-forward recompute as trunk remat
        either way; measured in docs/BENCH.md r3."""
    spec = RESNET_SPECS[name]
    out = fnn.conv2d(params["conv1"], x, stride=2, padding=3)
    if "stem_corr" in params:  # fused init_conv border term (optimize.py)
        out = fnn.stem_corr_add(params["stem_corr"], out, x.shape, 2, 3)
    out = fnn.relu(
        _norm(params["bn1"], out, norm_kind, training, bn_updates, "backbone/body/bn1")
    )
    feats = [out]  # level '2': post-relu, pre-maxpool, stride 2
    out = fnn.max_pool2d(out, 3, 2, 1)
    for stage in range(4):
        blocks = params[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        # replace_stride_with_dilation for layer4 (reference: backbone.py:130;
        # torchvision semantics: block 0 keeps dilation 1, later blocks use 2)
        dilate_stage = dilation and stage == 3
        if dilate_stage:
            stage_stride = 1

        def _block(bp, x_, b, coll, _ss=stage_stride, _ds=dilate_stage,
                   _stage=stage):
            stride = _ss if b == 0 else 1
            d = 2 if (_ds and b > 0) else 1
            return _bottleneck_apply(
                bp, x_, stride, d, spec["groups"], norm_kind, training,
                coll, f"backbone/body/layer{_stage + 1}/{b}",
            )

        if remat == "blocks":
            for b in range(len(blocks)):
                # BN stat updates flow out as checkpoint outputs so the
                # side-effect dict never leaks tracers across the boundary
                def _blk(bp_, x_, _b=b):
                    coll: dict = {}
                    y = _block(bp_, x_, _b,
                               coll if bn_updates is not None else None)
                    return y, coll
                out, coll = jax.checkpoint(_blk)(blocks[str(b)], out)
                if bn_updates is not None:
                    bn_updates.update(coll)
        elif remat == "stages":
            def _stg(sp_, x_):
                coll: dict = {}
                y = x_
                for b in range(len(sp_)):
                    y = _block(sp_[str(b)], y, b,
                               coll if bn_updates is not None else None)
                return y, coll
            out, coll = jax.checkpoint(_stg)(blocks, out)
            if bn_updates is not None:
                bn_updates.update(coll)
        else:
            for b in range(len(blocks)):
                out = _block(blocks[str(b)], out, b, bn_updates)
        feats.append(out)
    return feats


# ---------------------------------------------------------------------------
# Joiner: init_conv + backbone + per-level positional embeddings
# (reference: backbone.py:104-113,135-148)
# ---------------------------------------------------------------------------


def backbone_channels(name: str) -> List[int]:
    """Per-level channel counts (reference table: backbone.py:13-24)."""
    if "vgg" in name:
        from .backbones_extra import VGG_CHANNELS

        return VGG_CHANNELS
    if "efficientnet" in name:
        from .backbones_extra import EFFNET_CHANNELS

        return EFFNET_CHANNELS[name]
    return RESNET_CHANNELS


def backbone_init(key, cfg) -> Dict:
    k1, k2 = jax.random.split(key)
    name = cfg.backbone
    if "vgg" in name:
        from .backbones_extra import vgg16_bn_init

        body = vgg16_bn_init(k1)
    elif "efficientnet" in name:
        from .backbones_extra import efficientnet_init

        body = efficientnet_init(k1, name)
    else:
        body = resnet_init(k1, name)
    params: Dict = {"body": body}
    if cfg.inpt_channels != 3:
        params["init_conv"] = fnn.conv2d_init(
            k2, cfg.inpt_channels, 3, 1, init="torch_default"
        )
    if cfg.position_embedding in ("learned", "v3"):
        from ..ops.posenc import learned_pe_init

        params["pos_embed"] = learned_pe_init(jax.random.fold_in(k2, 1))
    return params


def backbone_apply(
    params: Dict,
    x: jnp.ndarray,
    cfg,
    training: bool = False,
    bn_updates: Optional[dict] = None,
    remat: str = "none",
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """x: (B, H, W, C_in) -> (features, positional embeddings), NHWC lists."""
    if cfg.position_embedding not in ("sine", "v2", "learned", "v3"):
        raise ValueError(
            f"position_embedding={cfg.position_embedding!r} not supported"
        )
    if "init_conv" in params:
        x = fnn.conv2d(params["init_conv"], x)
    name = cfg.backbone
    if "vgg" in name:
        from .backbones_extra import vgg16_bn_pyramid

        feats = vgg16_bn_pyramid(params["body"], x, training, bn_updates)
    elif "efficientnet" in name:
        from .backbones_extra import efficientnet_pyramid

        # the reference passes norm_layer=FrozenBatchNorm2d to the b0-b4
        # family but exempts v2 (and vgg) — backbone.py:123-131
        frozen = (
            cfg.norm_layer_backbone == "frozen_batchnorm"
            and not name.startswith("efficientnet_v2")
        )
        feats = efficientnet_pyramid(params["body"], x, name, training,
                                     bn_updates, frozen=frozen)
    else:
        feats = resnet_pyramid(
            params["body"], x, name, cfg.norm_layer_backbone,
            cfg.dilation, training, bn_updates, remat=remat,
        )
    if cfg.position_embedding in ("learned", "v3"):
        # note: the learned PE has a fixed 512-channel output that cannot
        # match any backbone level's channels — like the reference, using
        # it with add_posenc/attention PE fails at shape-check time; it is
        # provided for API completeness (position_encoding.py:86-95)
        from ..ops.posenc import learned_position_embedding_2d

        pos = [
            learned_position_embedding_2d(
                params["pos_embed"], f.shape[1], f.shape[2]
            )[None].astype(f.dtype)
            for f in feats
        ]
        return feats, pos
    pos = [
        sine_position_embedding_2d(
            f.shape[1], f.shape[2], f.shape[3], only_y=cfg.one_dim_posenc
        )[None].astype(f.dtype)
        for f in feats
    ]
    return feats, pos
