"""Box geometry ops — pure JAX, fixed shapes, +1 pixel-width convention.

All coordinates are (x1, y1, x2, y2) in absolute spectrogram pixels. The
``+1`` in widths/heights and the ``round`` in decode are load-bearing: they
define IoU-0.5 decisions and therefore mAP parity with the reference
(reference: nets_utils.py:103-207).
"""

from __future__ import annotations

import jax.numpy as jnp

IMG_SIZE = (375, 1024)  # (H, W) — reference: nets_utils.py:13


def _area_plus1(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0] + 1) * (boxes[..., 3] - boxes[..., 1] + 1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the +1 convention.

    a: (..., Na, 4), b: (..., Nb, 4) -> (..., Na, Nb)
    (reference: bbox_overlap, nets_utils.py:103-126)
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])   # x1,y1 max
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])   # x2,y2 min
    wh = jnp.clip(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = _area_plus1(a)[..., :, None] + _area_plus1(b)[..., None, :] - inter
    return inter / union


def encode_boxes(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Box -> regression targets relative to anchors
    (reference: bbox_transform, nets_utils.py:129-146)."""
    wa = anchors[..., 2] - anchors[..., 0] + 1.0
    ha = anchors[..., 3] - anchors[..., 1] + 1.0
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    x = boxes[..., 0] + 0.5 * w
    y = boxes[..., 1] + 0.5 * h
    return jnp.stack(
        [(x - xa) / wa, (y - ya) / ha, jnp.log(w / wa), jnp.log(h / ha)], axis=-1
    )


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Regression deltas + anchors -> rounded absolute coords.

    jnp.round is round-half-to-even, same as torch.round
    (reference: bbox_reg_to_coord, nets_utils.py:169-186).
    """
    wa = anchors[..., 2] - anchors[..., 0] + 1.0
    ha = anchors[..., 3] - anchors[..., 1] + 1.0
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha
    x = deltas[..., 0] * wa + xa
    y = deltas[..., 1] * ha + ya
    w = jnp.exp(deltas[..., 2]) * wa
    h = jnp.exp(deltas[..., 3]) * ha
    return jnp.stack(
        [
            jnp.round(x - 0.5 * w),
            jnp.round(y - 0.5 * h),
            jnp.round(x + 0.5 * w),
            jnp.round(y + 0.5 * h),
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, img_width: int, img_height: int) -> jnp.ndarray:
    """Clamp to [0, W-1] x [0, H-1] (reference: layers.py:279-280)."""
    x = jnp.clip(boxes[..., 0::2], 0.0, img_width - 1.0)
    y = jnp.clip(boxes[..., 1::2], 0.0, img_height - 1.0)
    return jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)


def coord_to_rel(bb: jnp.ndarray) -> jnp.ndarray:
    """Absolute -> normalized (cx, cy, w, h) (reference: nets_utils.py:24-27)."""
    h = bb[..., 3] - bb[..., 1]
    w = bb[..., 2] - bb[..., 0]
    x0 = bb[..., 0] + 0.5 * w
    y0 = bb[..., 1] + 0.5 * h
    return jnp.stack(
        [x0 / IMG_SIZE[1], y0 / IMG_SIZE[0], w / IMG_SIZE[1], h / IMG_SIZE[0]], axis=-1
    )


def rel_to_coord(rel: jnp.ndarray) -> jnp.ndarray:
    """Normalized (cx, cy, w, h) -> rounded absolute corners
    (reference: nets_utils.py:29-32)."""
    x0 = rel[..., 0] * IMG_SIZE[1]
    y0 = rel[..., 1] * IMG_SIZE[0]
    w = rel[..., 2] * IMG_SIZE[1]
    h = rel[..., 3] * IMG_SIZE[0]
    return jnp.round(
        jnp.stack([x0 - 0.5 * w, y0 - 0.5 * h, x0 + 0.5 * w, y0 + 0.5 * h], axis=-1)
    )


def masked_topk_indices(scores: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the top-k valid entries by descending score (stable).

    Invalid entries sort last; caller masks with ``arange(k) < valid.sum()``.
    """
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    return order[..., :k]
