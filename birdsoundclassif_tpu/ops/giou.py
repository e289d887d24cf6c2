"""Generalized-IoU box utilities (reference: nets/util/box_ops.py:9-88).

These use the DETR convention (NO +1 on widths, cxcywh<->xyxy helpers) and
back the optional GIoU loss path; the detection pipeline's +1-convention
IoU lives in ops/boxes.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """(N, 4) x (M, 4) -> iou (N, M), union (N, M); no +1 convention."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU = IoU - |hull \\ union| / |hull| (reference: box_ops.py:36-63)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull
