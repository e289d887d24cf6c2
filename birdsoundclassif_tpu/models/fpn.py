"""Feature pyramid networks: standard FPN and BiFPN.

reference: fpn.py:9-156. All resizes are bilinear align_corners=True
(expressed as separable matmuls, see ops/image.py); convs are NHWC.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from . import nn as fnn
from ..ops.image import resize_bilinear_align_corners


# ---------------------------------------------------------------------------
# standard FPN (reference: fpn.py:120-146)
# ---------------------------------------------------------------------------


def fpn_init(key, channels: Sequence[int], p_cn: int, out_cn: int) -> Dict:
    n = len(channels)
    keys = jax.random.split(key, 2 * n)
    return {
        "pt_wise": {
            str(i): fnn.conv2d_init(keys[i], c, p_cn, 1, init="torch_default")
            for i, c in enumerate(channels)
        },
        "out_convs": {
            str(i): fnn.conv2d_init(keys[n + i], p_cn, out_cn, 3, init="torch_default")
            for i in range(n)
        },
    }


def _out_conv(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 pad-1 out-conv; int8 path when the load-time fold quantized the
    params (optimize.quantize_fpn_out, opt-in)."""
    if "wq" in params:
        from ..ops.qconv import qconv2d_3x3

        return qconv2d_3x3(params, x)
    return fnn.conv2d(params, x, padding=1)


def fpn_apply(params: Dict, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Top-down pathway. Note the reference's out_convs indexing: conv '0'
    is applied to the coarsest level, conv 'n-1' to the finest
    (reference: fpn.py:136-146). Output list is bottom-up (finest first)."""
    p_outs = [fnn.conv2d(params["pt_wise"][str(i)], fm) for i, fm in enumerate(feats)]
    out = p_outs.pop(-1)
    outs = [_out_conv(params["out_convs"]["0"], out)]
    i = 0
    while p_outs:
        i += 1
        p_out = p_outs.pop(-1)
        up = resize_bilinear_align_corners(out, p_out.shape[1], p_out.shape[2])
        out = up + p_out
        outs.insert(0, _out_conv(params["out_convs"][str(i)], out))
    return outs


# ---------------------------------------------------------------------------
# BiFPN (reference: fpn.py:9-115)
# ---------------------------------------------------------------------------


def _fusion_init(key, n_ends: int, cn: int) -> Dict:
    k1, _ = jax.random.split(key)
    return {
        "weights": jnp.ones((n_ends,), jnp.float32),
        "conv": fnn.depthwise_sep_conv_init(k1, cn, cn),
    }


def _fusion_apply(params: Dict, inputs: List[jnp.ndarray], training, bn_updates, path):
    w = jax.nn.relu(params["weights"])
    num = sum(wi * xi for wi, xi in zip(w, inputs))
    den = w.sum() + 1e-4
    return fnn.depthwise_sep_conv(
        params["conv"], num / den, training=training
    ) if not training else _train_dsc(params["conv"], num / den, bn_updates, path)


def _train_dsc(p, x, bn_updates, path):
    y, stats = fnn.depthwise_sep_conv(p, x, training=True)
    if bn_updates is not None:
        bn_updates[path + "/conv/norm"] = stats
    return y


def _rescale_init(key, in_cn: int, out_cn: int) -> Dict:
    p: Dict = {}
    if in_cn != out_cn:
        p["pt_wise"] = fnn.conv2d_init(key, in_cn, out_cn, 1, init="torch_default")
    return p


def _rescale_apply(params: Dict, x: jnp.ndarray, out_hw) -> jnp.ndarray:
    out = resize_bilinear_align_corners(x, out_hw[0], out_hw[1])
    if "pt_wise" in params:
        out = fnn.conv2d(params["pt_wise"], out)
    return out


def bifpn_layer_init(key, channels: Sequence[int], output_channels: Optional[int]) -> Dict:
    n = len(channels)
    keys = jax.random.split(key, 5 * n + 2)
    ki = iter(range(5 * n + 2))
    p: Dict = {
        "rescalings_td": {
            str(i + 1): _rescale_init(keys[next(ki)], in_cn, out_cn)
            for i, (out_cn, in_cn) in enumerate(zip(channels[:-1], channels[1:]))
        },
        "rescalings_bu": {
            str(i): _rescale_init(keys[next(ki)], in_cn, out_cn)
            for i, (in_cn, out_cn) in enumerate(zip(channels[:-1], channels[1:]))
        },
        "fusions_td": {
            str(i + 1): _fusion_init(keys[next(ki)], 2, cn)
            for i, cn in enumerate(channels[1:-1])
        },
        "fusions_bu": {
            str(i): _fusion_init(keys[next(ki)], 2 if i in [0, n - 1] else 3, cn)
            for i, cn in enumerate(channels)
        },
    }
    if output_channels is not None:
        p["out_pt_wise_convs"] = {
            str(i): fnn.conv2d_init(keys[next(ki)], cn, output_channels, 1,
                                    init="torch_default")
            for i, cn in enumerate(channels)
        }
    return p


def bifpn_layer_apply(params: Dict, inputs: List[jnp.ndarray], training=False,
                      bn_updates=None, path="") -> List[jnp.ndarray]:
    """reference: BiFPNLayer.forward (fpn.py:72-100)."""
    n = len(inputs)
    sizes = [f.shape[1:3] for f in inputs]
    # top-down
    td_out = inputs[-1]
    td_outs = [td_out]
    for i in range(n - 2, 0, -1):
        td_out = _fusion_apply(
            params["fusions_td"][str(i)],
            [inputs[i], _rescale_apply(params["rescalings_td"][str(i + 1)], td_out, sizes[i])],
            training, bn_updates, f"{path}/fusions_td/{i}",
        )
        td_outs.insert(0, td_out)
    td_outs.insert(0, _rescale_apply(params["rescalings_td"]["1"], td_out, sizes[0]))
    # bottom-up
    bu_out = _fusion_apply(
        params["fusions_bu"]["0"], [inputs[0], td_outs[0]],
        training, bn_updates, f"{path}/fusions_bu/0",
    )
    bu_outs = [bu_out]
    for i in range(1, n - 1):
        bu_out = _fusion_apply(
            params["fusions_bu"][str(i)],
            [inputs[i], td_outs[i],
             _rescale_apply(params["rescalings_bu"][str(i - 1)], bu_out, sizes[i])],
            training, bn_updates, f"{path}/fusions_bu/{i}",
        )
        bu_outs.append(bu_out)
    bu_outs.append(
        _fusion_apply(
            params["fusions_bu"][str(n - 1)],
            [inputs[-1], _rescale_apply(params["rescalings_bu"][str(n - 2)], bu_out, sizes[-1])],
            training, bn_updates, f"{path}/fusions_bu/{n - 1}",
        )
    )
    if "out_pt_wise_convs" in params:
        bu_outs = [
            fnn.conv2d(params["out_pt_wise_convs"][str(i)], b) for i, b in enumerate(bu_outs)
        ]
    return bu_outs


def bifpn_init(key, n_layers: int, channels: Sequence[int], out_cn: int) -> Dict:
    keys = jax.random.split(key, n_layers)
    return {
        "layers": {
            str(i): bifpn_layer_init(keys[i], channels, out_cn if i == n_layers - 1 else None)
            for i in range(n_layers)
        }
    }


def bifpn_apply(params: Dict, feats, training=False, bn_updates=None):
    for i in range(len(params["layers"])):
        feats = bifpn_layer_apply(params["layers"][str(i)], feats, training, bn_updates,
                                  f"bifpn/{i}")
    return feats


# ---------------------------------------------------------------------------
# dispatch (reference: build_fpn, fpn.py:149-156)
# ---------------------------------------------------------------------------


def build_fpn_init(key, cfg, channels: Sequence[int]) -> Dict:
    if cfg.fpn == "fpn":
        return fpn_init(key, channels, cfg.fpn_p_chan, cfg.out_fpn_chan)
    if cfg.fpn == "bifpn":
        return bifpn_init(key, cfg.n_bifpn_layers, channels, cfg.out_fpn_chan)
    raise ValueError(f"not supported {cfg.fpn}")


def build_fpn_apply(params: Dict, cfg, feats, training=False, bn_updates=None):
    if cfg.fpn == "fpn":
        return fpn_apply(params, feats)
    return bifpn_apply(params, feats, training, bn_updates)
