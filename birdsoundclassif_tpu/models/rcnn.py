"""Second-stage RCNN head and the fixed-shape inference cascade.

RCNN (reference: layers.py:500-586): a 1x1 `pe_proj` on the pooled RoI PE,
`depth_rcnn` DepthwiseSepConv2d blocks with FiLM-style PE modulation, then
linear box regression (4*(C+1)) and softmax classification (C+1).

FastRCNN inference (reference: layers.py:654-778): per RoI take the argmax
class and its 4 regression values, decode on the RoI, clip, sort by score,
one all-class NMS that first drops class-0 RoIs, then per-class NMS +
min_score. With equal thresholds the per-class pass cannot suppress
anything after the all-class pass (survivors are mutually < thresh), so it
reduces to a per-class top-`proposal_number` cap — implemented here as a
vectorized rank mask. Output is a fixed-slot (boxes, scores, class, valid)
tuple per image; the species dict surface is assembled on the host.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import nn as fnn
from .roi import roi_pool
from ..ops.boxes import clip_boxes, decode_boxes
from ..ops.nms import greedy_nms_prefix


def rcnn_init(key, cfg) -> Dict:
    c = cfg.out_fpn_chan
    num_classes = cfg.num_classes
    hidden = c * cfg.roi_pool_h * cfg.roi_pool_w
    keys = jax.random.split(key, cfg.depth_rcnn + 3)
    return {
        "pe_proj": fnn.conv2d_init(keys[0], c, c, 1, init="kaiming"),
        "blocks": {
            str(i): fnn.depthwise_sep_conv_init(keys[1 + i], c, c, pe_channels=c)
            for i in range(cfg.depth_rcnn)
        },
        "bbox_reg_layer": fnn.linear_init(
            keys[cfg.depth_rcnn + 1], hidden, 4 * (1 + num_classes), init="kaiming"
        ),
        "bbox_classif_layer": fnn.linear_init(
            keys[cfg.depth_rcnn + 2], hidden, 1 + num_classes, init="kaiming"
        ),
    }


def rcnn_apply(
    params: Dict,
    roi_pool_out: jnp.ndarray,  # (B, R, ph, pw, C)
    roi_pe_out: jnp.ndarray,    # (B, R, ph, pw, C)
    training: bool = False,
    bn_updates: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (bbox_reg (B*R, 4*(C+1)), bbox_classes (B*R, C+1) softmaxed)."""
    b, r, ph, pw, c = roi_pool_out.shape
    x = roi_pool_out.reshape(b * r, ph, pw, c)
    pe = roi_pe_out.reshape(b * r, ph, pw, c)
    pe = fnn.conv2d(params["pe_proj"], pe)
    for i in range(len(params["blocks"])):
        blk = params["blocks"][str(i)]
        if training:
            x, stats = fnn.depthwise_sep_conv(blk, x, pe=pe, training=True)
            if bn_updates is not None:
                bn_updates[f"head/rcnn/blocks/{i}/norm"] = stats
        else:
            x = fnn.depthwise_sep_conv(blk, x, pe=pe)
    # NOTE layout: flatten is (ph, pw, C); the torch reference flattens
    # (C, ph, pw) — the checkpoint converter permutes linear rows to match.
    flat = x.reshape(b * r, ph * pw * c).astype(jnp.float32)  # f32 heads
    bbox_reg = fnn.linear(params["bbox_reg_layer"], flat)
    bbox_classes = jax.nn.softmax(fnn.linear(params["bbox_classif_layer"], flat), axis=-1)
    return bbox_reg, bbox_classes


class Detections(NamedTuple):
    """Fixed-slot per-image detections (R slots)."""

    boxes: jnp.ndarray    # (B, R, 4) absolute window coords
    scores: jnp.ndarray   # (B, R)
    classes: jnp.ndarray  # (B, R) int32 in [1, num_classes]; 0 => dropped
    valid: jnp.ndarray    # (B, R) bool


def fast_rcnn_inference(
    bbox_reg: jnp.ndarray,      # (B*R, 4*(C+1))
    bbox_classes: jnp.ndarray,  # (B*R, C+1)
    rois: jnp.ndarray,          # (B, R, 4)
    roi_valid: jnp.ndarray,     # (B, R)
    cfg,
    nms_thresh: float = 0.3,
    min_score: float = 0.5,
) -> Detections:
    b, r = rois.shape[:2]
    num_classes = cfg.num_classes

    scores_flat = bbox_classes.max(axis=1)
    pred_class = bbox_classes.argmax(axis=1)
    # class-specific regression slot (reference: layers.py:696-699)
    reg_by_class = bbox_reg.reshape(-1, num_classes + 1, 4)
    sel_reg = jnp.take_along_axis(
        reg_by_class, pred_class[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]

    scores = scores_flat.reshape(b, r)
    classes = pred_class.reshape(b, r).astype(jnp.int32)
    deltas = sel_reg.reshape(b, r, 4)

    boxes = decode_boxes(deltas.astype(jnp.float32), rois.astype(jnp.float32))
    boxes = clip_boxes(boxes, cfg.img_width, cfg.img_height)

    # all-class NMS over non-background, valid RoIs: sort to (valid-first,
    # score-desc) greedy order, suppress, scatter back
    cand = roi_valid & (classes > 0)
    sort_key = jnp.where(cand, scores, -jnp.inf)
    order = jnp.argsort(-sort_key, axis=1, stable=True)
    sorted_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    keep_sorted = greedy_nms_prefix(
        sorted_boxes, cand.sum(axis=1).astype(jnp.int32), nms_thresh
    )
    keep = jax.vmap(lambda o, k: jnp.zeros((r,), bool).at[o].set(k))(order, keep_sorted)

    # per-class cap at proposal_number (see module docstring for why the
    # reference's per-class NMS reduces to a cap after the all-class pass)
    in_class_rank = _rank_within_class(scores, classes, keep, num_classes)
    keep = keep & (in_class_rank < cfg.proposal_number)

    valid = keep & (scores > min_score)
    return Detections(boxes=boxes, scores=scores, classes=classes, valid=valid)


def _rank_within_class(scores, classes, keep, num_classes):
    """For each kept detection, its 0-based rank (by descending score) among
    kept detections of the same class in the same image."""
    b, r = scores.shape

    def per_image(sc, cl, kp):
        order = jnp.argsort(-jnp.where(kp, sc, -jnp.inf), stable=True)
        cl_sorted = cl[order]
        kp_sorted = kp[order]
        onehot = jax.nn.one_hot(cl_sorted, num_classes + 1, dtype=jnp.int32)
        onehot = onehot * kp_sorted[:, None]
        rank_sorted = jnp.take_along_axis(
            jnp.cumsum(onehot, axis=0) - onehot, cl_sorted[:, None], axis=1
        )[:, 0]
        return jnp.zeros((r,), jnp.int32).at[order].set(rank_sorted)

    return jax.vmap(per_image)(scores, classes, keep)
