"""Inference-time param transformations.

fold_frozen_bn: FrozenBatchNorm is an affine constant at inference
(reference: backbone.py:26-62) — fold it into the preceding conv's weights
and bias so the per-activation elementwise pass (and its bf16->f32->bf16
round trip over the largest tensors in the model) disappears entirely. The
BN params are rewritten to exact identities (var = 1 - eps) so the
unmodified forward stays correct.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .nn import BN_EPS


def _fold_pair(conv: Dict, bn: Dict) -> None:
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    conv["w"] = conv["w"] * scale[None, None, None, :]
    b = conv.get("b", 0.0)
    conv["b"] = b * scale + bn["bias"] - bn["mean"] * scale
    bn["scale"] = jnp.ones_like(bn["scale"])
    bn["bias"] = jnp.zeros_like(bn["bias"])
    bn["mean"] = jnp.zeros_like(bn["mean"])
    bn["var"] = jnp.full_like(bn["var"], 1.0 - BN_EPS)  # rsqrt(var+eps) == 1


def fold_frozen_bn(params: Dict, cfg) -> Dict:
    """Returns a deep-copied params pytree with every backbone BN folded
    into its preceding conv. Inference-only: valid for every family because
    at eval both frozen_batchnorm and batchnorm(training=False) are the same
    affine constant (running stats, shared BN_EPS) — do not train the
    folded tree (live-BN batch statistics would be wrong)."""
    params = jax.tree.map(lambda x: x, params)  # structural copy
    body = params["backbone"]["body"]
    if "vgg" in cfg.backbone:
        i = 0
        while f"conv{i}" in body:
            _fold_pair(body[f"conv{i}"], body[f"bn{i}"])
            i += 1
    elif "efficientnet" in cfg.backbone:
        _fold_pair(body["stem_conv"], body["stem_bn"])
        for sk, stage in body.items():
            if not sk.startswith("stage"):
                continue
            for blk in stage.values():
                for c, n in (
                    ("fused_conv", "fused_bn"),
                    ("expand_conv", "expand_bn"),
                    ("dw_conv", "dw_bn"),
                    ("project_conv", "project_bn"),
                ):
                    if c in blk:
                        _fold_pair(blk[c], blk[n])
        if "head_conv" in body:  # v2 family's 1x1 head tap
            _fold_pair(body["head_conv"], body["head_bn"])
    else:  # resnet / resnext
        _fold_pair(body["conv1"], body["bn1"])
        for stage in range(1, 5):
            layer = body.get(f"layer{stage}")
            if layer is None:
                continue
            for b in layer.values():
                for ci in ("1", "2", "3"):
                    _fold_pair(b[f"conv{ci}"], b[f"bn{ci}"])
                if "downsample" in b:
                    _fold_pair(b["downsample"]["conv"], b["downsample"]["bn"])
    return params


def _first_conv_key(cfg) -> str:
    if "vgg" in cfg.backbone:
        return "conv0"
    if "efficientnet" in cfg.backbone:
        return "stem_conv"
    return "conv1"


def fold_init_conv(params: Dict, cfg) -> Dict:
    """Compose the 1x1 init_conv into the backbone's first conv (inference).

    The reference adapts 1-channel spectrograms to 3-channel pretrained
    stems with a 1x1 conv ahead of the backbone (backbone.py:104-113);
    there is no nonlinearity between it and the stem conv, so the two
    linear maps compose into one conv with 3x fewer contraction taps
    (k*k*C_in vs k*k*3) and no 3-channel full-resolution intermediate in
    HBM — measured on the resnet50 stem in docs/BENCH.md (r3).

    Zero-padding subtlety: the unfused stem conv zero-pads the *3-channel*
    map, so init_conv's bias contributes only at in-bounds taps. The fused
    conv therefore needs a border term
        corr[p] = sum_{in-bounds taps t} W1[t] @ b0,
    which is exactly a stride/pad-matched conv of a ones-map against the
    bias-contracted kernel kb[t, 0, o] = sum_c W1[t, c, o] * b0[c]; the
    forward adds it right after the first conv (nn.stem_corr_add). Exact
    up to float reassociation; inference-only (the composed weight cannot
    be trained as two factors).
    """
    bb = params["backbone"]
    if "init_conv" not in bb:
        return params
    params = jax.tree.map(lambda x: x, params)  # structural copy
    bb = params["backbone"]
    body = bb["body"]
    first = body[_first_conv_key(cfg)]
    ic = bb.pop("init_conv")
    w0 = ic["w"][0, 0]                      # (C_in, 3)
    w1 = first["w"]                         # (kh, kw, 3, C_out)
    first["w"] = jnp.einsum("ic,hwco->hwio", w0, w1)
    if "b" in ic:
        kb = jnp.einsum("c,hwco->hwo", ic["b"], w1)[:, :, None, :]
        body["stem_corr"] = {"w": kb}       # (kh, kw, 1, C_out)
    return params


def quantize_fpn_out(params: Dict, cfg) -> Dict:
    """Replace the standard FPN's 3x3 out-conv weights with per-channel
    int8 + scales (ops/qconv.py). Opt-in via cfg.quantize_fpn; inference
    only — the quantized leaves are never written back to checkpoints
    (load_model folds after load). No-op for BiFPN (depthwise-sep convs
    don't feed the MXU int8 path)."""
    if not getattr(cfg, "quantize_fpn", False) or cfg.fpn != "fpn":
        return params
    from ..ops.qconv import quantize_conv_params

    params = jax.tree.map(lambda x: x, params)  # structural copy
    out_convs = params["fpn"]["out_convs"]
    for k in list(out_convs):
        out_convs[k] = quantize_conv_params(out_convs[k])
    return params


def fold_inference(params: Dict, cfg) -> Dict:
    """All inference-only pytree folds: frozen/eval BN into convs, the
    init_conv into the stem conv, then optional int8 quantization of the
    FPN out-convs. Returns a new tree; do not train it."""
    return quantize_fpn_out(fold_init_conv(fold_frozen_bn(params, cfg), cfg), cfg)
