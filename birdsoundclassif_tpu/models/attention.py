"""Self-attention pyramid over backbone feature maps.

Single-head QKV attention per pyramid level with a residual add
(reference: self_attention.py:10-82). Default config
(pyramid_top_n_attn=2, 5 levels) attends only on the two coarsest levels
with inner_dim = channels // 2, no downscale, no PE — the cheap branch.
The top_n == n_levels branch (downscale 2**(3-i) + frequency PE) is also
implemented; note the reference discards the attention output there and
returns the up/down-scaled *input* (self_attention.py:52-54) — that exact
behavior is reproduced behind `faithful_downscale_bug=True`.

TPU notes: attention is one einsum chain per level (MXU), softmax scaling
uses np.round(sqrt(d), 2) to match the reference (self_attention.py:47).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as fnn
from ..ops.image import resize_bilinear_align_corners
from ..ops.posenc import one_dim_positional_encoding


def self_attention_init(key, input_dim: int, inner_dim: int) -> Dict:
    keys = jax.random.split(key, 4)
    # torch nn.Linear default init (the reference does not re-init these)
    return {
        "query": fnn.linear_init(keys[0], input_dim, inner_dim, init="torch_default"),
        "key": fnn.linear_init(keys[1], input_dim, inner_dim, init="torch_default"),
        "value": fnn.linear_init(keys[2], input_dim, inner_dim, init="torch_default"),
        "final_projection": fnn.linear_init(keys[3], inner_dim, input_dim, init="torch_default"),
    }


def self_attention_apply(
    params: Dict,
    x: jnp.ndarray,
    downscale_factor: int = 1,
    position_encoding: bool = False,
    faithful_downscale_bug: bool = True,
) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, H, W, C) attention context (no residual)."""
    b, h0, w0, c = x.shape
    if position_encoding:
        pe = one_dim_positional_encoding(h0, c)  # (H, C)
        x = x + 0.5 * pe[None, :, None, :].astype(x.dtype)
    inp = x
    if downscale_factor > 1:
        inp = resize_bilinear_align_corners(
            x, h0 // downscale_factor, w0 // downscale_factor
        )
    h, w = inp.shape[1:3]
    tokens = inp.reshape(b, h * w, c)
    q = fnn.linear(params["query"], tokens)
    k = fnn.linear(params["key"], tokens)
    v = fnn.linear(params["value"], tokens)
    scale = float(np.round(np.sqrt(q.shape[-1]), 2))
    attn = jax.nn.softmax(
        jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32) / scale,
        axis=-1,
    ).astype(v.dtype)
    ctx = jnp.einsum("blm,bmd->bld", attn, v, preferred_element_type=jnp.float32)
    ctx = fnn.linear(params["final_projection"], ctx.astype(x.dtype))
    ctx = ctx.reshape(b, h, w, c)
    if downscale_factor > 1:
        if faithful_downscale_bug:
            # reference returns the resized *input*, not the context
            # (self_attention.py:52-54)
            return resize_bilinear_align_corners(inp, h0, w0)
        return resize_bilinear_align_corners(ctx, h0, w0)
    return ctx


def sa_pyramid_init(key, channels: Sequence[int], top_n: int) -> Dict:
    """reference: SAPyramid.__init__ (self_attention.py:59-70)."""
    n = len(channels)
    keys = jax.random.split(key, n)
    modules: Dict = {}
    for i, c in enumerate(channels):
        if top_n == n:
            modules[str(i)] = self_attention_init(keys[i], c, c)
        elif i >= n - top_n:
            modules[str(i)] = self_attention_init(keys[i], c, c // 2)
        # else: identity — no params
    return modules


def sa_pyramid_apply(
    params: Dict, feats: List[jnp.ndarray], top_n: int
) -> List[jnp.ndarray]:
    """Per level: fm + module(fm) (reference: self_attention.py:72-76).
    For identity levels the reference therefore computes fm + fm = 2*fm —
    reproduced faithfully below."""
    n = len(feats)
    out = []
    for i, fm in enumerate(feats):
        if str(i) in params:
            if top_n == n:
                ds = max(1, 2 ** (3 - i))
                ctx = self_attention_apply(params[str(i)], fm, ds, position_encoding=True)
            else:
                ctx = self_attention_apply(params[str(i)], fm, 1, position_encoding=False)
            out.append(fm + ctx)
        else:
            # reference: fm + Identity()(fm) == fm + fm == 2 * fm
            # (self_attention.py:69,76) — faithful reproduction
            out.append(fm + fm)
    return out
