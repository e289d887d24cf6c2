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
