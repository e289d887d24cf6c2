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
    """Returns a deep-copied params pytree with backbone frozen-BN folded.
    No-op unless the backbone is a frozen-BN resnet."""
    if cfg.norm_layer_backbone != "frozen_batchnorm" or (
        "vgg" in cfg.backbone or "efficientnet" in cfg.backbone
    ):
        return params
    params = jax.tree.map(lambda x: x, params)  # structural copy
    body = params["backbone"]["body"]
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
