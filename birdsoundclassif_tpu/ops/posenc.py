"""Sinusoidal positional encodings (static, computed in numpy at trace time).

Exact ports of the reference's formulas (reference:
position_encoding.py:10-15 and :18-56); layouts are NHWC-friendly.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _one_dim_pe_np(length: int, cn: int, temp: float = 10000.0) -> np.ndarray:
    """(length, cn): interleaved sin(even-col) / cos(odd-col) of pos 1..length
    (reference: one_dimension_positional_encoding, position_encoding.py:10-15)."""
    pos = np.arange(1, length + 1, dtype=np.float32)
    dt = temp ** (2 * (np.arange(cn, dtype=np.float32) // 2) / cn)
    posenc = pos[:, None] / dt[None, :]
    pe = np.stack([np.sin(posenc[:, 0::2]), np.cos(posenc[:, 1::2])], axis=2)
    return pe.reshape(length, -1).astype(np.float32)


def one_dim_positional_encoding(length: int, cn: int, temp: float = 10000.0) -> jnp.ndarray:
    return jnp.asarray(_one_dim_pe_np(length, cn, temp))


@lru_cache(maxsize=None)
def _sine_pe_2d_np(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    only_y: bool = True,
) -> np.ndarray:
    """(h, w, C) sine embedding; C = num_pos_feats if only_y else
    2 * num_pos_feats (reference: PositionEmbeddingSine,
    position_encoding.py:18-56 with normalize=True, scale=2*pi)."""
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = temperature ** (
        2 * (np.arange(num_pos_feats, dtype=np.float32) // 2) / num_pos_feats
    )
    pos_y = y_embed[:, :, None] / dim_t
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3)
    pos_y = pos_y.reshape(h, w, -1)
    if only_y:
        return pos_y.astype(np.float32)
    pos_x = x_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


def sine_position_embedding_2d(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    only_y: bool = True,
) -> jnp.ndarray:
    return jnp.asarray(_sine_pe_2d_np(h, w, num_pos_feats, temperature, normalize, only_y))


# ---------------------------------------------------------------------------
# learned absolute PE (reference: PositionEmbeddingLearned,
# position_encoding.py:59-83 — DETR-style 50-slot row/col embedding tables)
# ---------------------------------------------------------------------------


def learned_pe_init(key, num_pos_feats: int = 256, num_embeddings: int = 50):
    """{row_embed, col_embed}: (50, num_pos_feats) each, uniform [0, 1)
    (reference reset_parameters: nn.init.uniform_)."""
    import jax

    k1, k2 = jax.random.split(key)
    return {
        "row_embed": jax.random.uniform(k1, (num_embeddings, num_pos_feats)),
        "col_embed": jax.random.uniform(k2, (num_embeddings, num_pos_feats)),
    }


def learned_position_embedding_2d(params, h: int, w: int) -> jnp.ndarray:
    """(h, w, 2*num_pos_feats): col embedding broadcast over rows ++ row
    embedding broadcast over cols (channel order matches the reference's
    cat([x_emb, y_emb]) before its NCHW permute).

    Caveat (documented deviation): the reference indexes nn.Embedding with
    arange(h)/arange(w) and *crashes* for feature maps wider than 50 px;
    JAX gathers clamp out-of-range indices instead, so levels beyond 50 px
    repeat the last embedding row rather than erroring.
    """
    x_emb = jnp.take(params["col_embed"], jnp.arange(w), axis=0, mode="clip")
    y_emb = jnp.take(params["row_embed"], jnp.arange(h), axis=0, mode="clip")
    return jnp.concatenate(
        [
            jnp.broadcast_to(x_emb[None, :, :], (h, w, x_emb.shape[-1])),
            jnp.broadcast_to(y_emb[:, None, :], (h, w, y_emb.shape[-1])),
        ],
        axis=-1,
    )
