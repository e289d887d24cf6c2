"""Transformer-RCNN second-stage head (`--tf_rcnn` variant).

Pooled RoIs become tokens: linear+LeakyReLU embeddings for features and
positional encodings, a 6-layer post-norm transformer encoder, then linear
box-reg / softmax class heads (reference: layers.py:589-651 with the
DETR-style encoder of self_attention.py:89-140). Two PE modes:
  * tf_pe_qk=True: PE added to Q and K at every layer (not V)
  * tf_pe_qk=False: PE added once to the input tokens
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import nn as fnn


def _mha_init(key, d_model: int, nhead: int) -> Dict:
    keys = jax.random.split(key, 4)
    # torch MultiheadAttention: xavier_uniform packed in_proj, out_proj default
    import math

    bound = math.sqrt(6.0 / (2 * d_model))

    def xavier(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "q": {"w": xavier(keys[0], (d_model, d_model)), "b": jnp.zeros((d_model,))},
        "k": {"w": xavier(keys[1], (d_model, d_model)), "b": jnp.zeros((d_model,))},
        "v": {"w": xavier(keys[2], (d_model, d_model)), "b": jnp.zeros((d_model,))},
        "out": fnn.linear_init(keys[3], d_model, d_model, init="torch_default"),
    }


def _mha_apply(p: Dict, q_in, k_in, v_in, nhead: int) -> jnp.ndarray:
    b, l, d = q_in.shape
    hd = d // nhead

    def proj(pp, x):
        return (x @ pp["w"] + pp["b"]).reshape(b, l, nhead, hd)

    q = proj(p["q"], q_in)
    k = proj(p["k"], k_in)
    v = proj(p["v"], v_in)
    attn = jax.nn.softmax(
        jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
        / jnp.sqrt(jnp.float32(hd)),
        axis=-1,
    )
    ctx = jnp.einsum("bhlm,bmhd->blhd", attn, v, preferred_element_type=jnp.float32)
    return fnn.linear(p["out"], ctx.reshape(b, l, d))


def _layernorm_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _layernorm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _encoder_layer_init(key, d_model, dim_ff):
    keys = jax.random.split(key, 3)
    return {
        "self_attn": _mha_init(keys[0], d_model, 8),
        "linear1": fnn.linear_init(keys[1], d_model, dim_ff, init="torch_default"),
        "linear2": fnn.linear_init(keys[2], dim_ff, d_model, init="torch_default"),
        "norm1": _layernorm_init(d_model),
        "norm2": _layernorm_init(d_model),
    }


def _encoder_layer_apply(p, src, pos, nhead, pe_qk: bool, activation):
    if pe_qk:
        q = k = src + pos
        v = src
    else:
        q = k = v = src
    src2 = _mha_apply(p["self_attn"], q, k, v, nhead)
    src = _layernorm(p["norm1"], src + src2)
    src2 = fnn.linear(p["linear2"], activation(fnn.linear(p["linear1"], src)))
    return _layernorm(p["norm2"], src + src2)


def tf_rcnn_init(key, cfg) -> Dict:
    in_dim = cfg.out_fpn_chan * cfg.roi_pool_h * cfg.roi_pool_w
    d = cfg.tf_model_dim
    n_layers = cfg.tf_num_encoder_layers
    keys = jax.random.split(key, n_layers + 4)
    # reference _reset_parameters: xavier_uniform on every >1-dim param
    # (layers.py:631-634); embeddings/heads included
    import math

    def xavier(k, fan_in, fan_out):
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return {
            "w": jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -bound, bound),
            "b": jnp.zeros((fan_out,), jnp.float32),
        }

    return {
        "pos_embedding": xavier(keys[0], in_dim, d),
        "rois_embedding": xavier(keys[1], in_dim, d),
        "layers": {
            str(i): _encoder_layer_init(keys[2 + i], d, cfg.tf_dim_feedforward)
            for i in range(n_layers)
        },
        "bbox_reg_layer": xavier(keys[n_layers + 2], d, 4 * (1 + cfg.num_classes)),
        "bbox_classif_layer": xavier(keys[n_layers + 3], d, 1 + cfg.num_classes),
    }


def tf_rcnn_apply(
    params: Dict,
    roi_pool_out: jnp.ndarray,  # (B, R, ph, pw, C)
    roi_pe_out: jnp.ndarray,
    cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, r = roi_pool_out.shape[:2]
    feat = roi_pool_out.reshape(b, r, -1)
    pos = roi_pe_out.reshape(b, r, -1)
    pos = jax.nn.leaky_relu(fnn.linear(params["pos_embedding"], pos))
    src = jax.nn.leaky_relu(fnn.linear(params["rois_embedding"], feat))
    # reference: custom encoder (LeakyReLU FF) when tf_pe_qk, torch default
    # encoder (ReLU FF, PE pre-added) otherwise
    activation = jax.nn.leaky_relu if cfg.tf_pe_qk else jax.nn.relu
    if not cfg.tf_pe_qk:
        src = src + pos
    for i in range(len(params["layers"])):
        src = _encoder_layer_apply(
            params["layers"][str(i)], src, pos, cfg.tf_nhead, cfg.tf_pe_qk, activation
        )
    bbox_reg = fnn.linear(params["bbox_reg_layer"], src).reshape(b * r, -1)
    bbox_classes = jax.nn.softmax(
        fnn.linear(params["bbox_classif_layer"], src), axis=-1
    ).reshape(b * r, -1)
    return bbox_reg, bbox_classes
