"""Region proposal network + fixed-shape proposal layer.

RPN (reference: layers.py:49-99): one DepthwiseSepConv2d per pyramid level
with stride anchor_stride / 2^(i+1) (bilinear upsample when < 1), adaptive
avg pool to top_size, then 1x1 objectness (A*2, softmaxed) and box (A*4)
heads, concatenated level-major so scores align with the scale-major anchor
grid.

ProposalLayer (reference: layers.py:219-303): decode -> clip -> min-size
filter -> score-sorted pre-NMS top-N (min over batch, the reference's
coupling) -> NMS(0.7) -> post-NMS top-N. All data-dependent sizes become
validity masks over static slots.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as fnn
from ..ops.anchors import full_anchor_grid
from ..ops.boxes import clip_boxes, decode_boxes
from ..ops.image import adaptive_avg_pool
from ..ops.nms import greedy_nms_prefix, select_post_nms


def rpn_init(key, cfg) -> Dict:
    n_layers = cfg.n_layers
    in_cn = cfg.out_fpn_chan
    a = cfg.n_ratios
    keys = jax.random.split(key, 3 * n_layers)
    return {
        "convs": {
            str(i): fnn.depthwise_sep_conv_init(keys[i], in_cn, in_cn, expansion=2)
            for i in range(n_layers)
        },
        "cls_score": {
            str(i): fnn.conv2d_init(keys[n_layers + i], in_cn, a * 2, 1, init="kaiming")
            for i in range(n_layers)
        },
        "bbox_reg": {
            str(i): fnn.conv2d_init(keys[2 * n_layers + i], in_cn, a * 4, 1, init="kaiming")
            for i in range(n_layers)
        },
    }


def rpn_apply(
    params: Dict,
    feats: List[jnp.ndarray],
    cfg,
    training: bool = False,
    bn_updates: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feats: FPN pyramid (NHWC). Returns
    cls_scores (B, h, w, L*A, 2) softmaxed and bbox_reg (B, h, w, L*A, 4)."""
    th, tw = cfg.top_size
    a = cfg.n_ratios
    if getattr(cfg, "rpn_head_f32", False):
        # mixed precision follows the activation dtype (models/nn.py conv2d):
        # one cast here runs the whole stage-1 head — depthwise conv, BN,
        # objectness/box 1x1s — in f32. This removes the bf16 knife-edge
        # behind the bistable training takeoff (config.py rpn_head_f32).
        feats = [fm.astype(jnp.float32) for fm in feats]
    conv_out = []
    for i, fm in enumerate(feats):
        stride = cfg.anchor_stride / (2 ** (i + 1))
        if training:
            y, stats = fnn.depthwise_sep_conv(
                params["convs"][str(i)], fm, stride=stride, training=True
            )
            if bn_updates is not None:
                bn_updates[f"head/rpn/convs/{i}/norm"] = stats
        else:
            y = fnn.depthwise_sep_conv(params["convs"][str(i)], fm, stride=stride)
        conv_out.append(adaptive_avg_pool(y, th, tw))
    b = conv_out[0].shape[0]
    cls_list, reg_list = [], []
    for i, fm in enumerate(conv_out):
        # head outputs in f32: proposal scores drive sorts/NMS decisions
        cls = fnn.conv2d(params["cls_score"][str(i)], fm).astype(jnp.float32)
        cls = jax.nn.softmax(cls.reshape(b, th, tw, a, 2), axis=-1)
        reg = fnn.conv2d(params["bbox_reg"][str(i)], fm).astype(jnp.float32)
        reg = reg.reshape(b, th, tw, a, 4)
        cls_list.append(cls)
        reg_list.append(reg)
    cls_scores = jnp.concatenate(cls_list, axis=3)  # level-major anchor dim
    bbox_reg = jnp.concatenate(reg_list, axis=3)
    return cls_scores, bbox_reg


class Proposals(NamedTuple):
    rois: jnp.ndarray      # (B, post_topN, 4)
    scores: jnp.ndarray    # (B, post_topN)
    valid: jnp.ndarray     # (B, post_topN) bool
    rpn_ok: jnp.ndarray    # scalar bool: pre-NMS count >= rcnn_batch_size
                           # (reference RPN-failure early-return, layers.py:288-290)


def proposal_layer(
    cls_scores: jnp.ndarray,
    bbox_reg: jnp.ndarray,
    cfg,
    training: bool = False,
) -> Proposals:
    b, th, tw, la, _ = cls_scores.shape
    n = th * tw * la
    scores = cls_scores[..., 1].reshape(b, n)
    deltas = bbox_reg.reshape(b, n, 4)
    anchors = jnp.asarray(
        full_anchor_grid(
            cfg.base_size, tuple(cfg.ratios), tuple(cfg.scales), tw, th, cfg.anchor_stride
        )
    )
    boxes = decode_boxes(deltas.astype(jnp.float32), anchors[None])
    boxes = clip_boxes(boxes, cfg.img_width, cfg.img_height)

    keep = (
        (boxes[..., 2] - boxes[..., 0] + 1 >= cfg.min_threshold)
        & (boxes[..., 3] - boxes[..., 1] + 1 >= cfg.min_threshold)
    )

    pre_top = cfg.pre_nms_topN if training else cfg.pre_nms_topN_eval
    post_top = cfg.post_nms_topN if training else cfg.post_nms_topN_eval
    pre_top = min(pre_top, n)

    # reference: pre_nms_topN = min(pre_nms_topN, min over batch of keep.sum())
    keep_counts = keep.sum(axis=1)
    pre_eff = jnp.minimum(keep_counts.min(), pre_top)
    rpn_ok = pre_eff >= cfg.rcnn_batch_size

    key = jnp.where(keep, scores, -jnp.inf)
    order = jnp.argsort(-key, axis=1, stable=True)[:, :pre_top]
    top_scores = jnp.take_along_axis(scores, order, axis=1)
    top_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    top_valid = jnp.broadcast_to(jnp.arange(pre_top)[None, :] < pre_eff, (b, pre_top))

    # top_boxes are score-sorted with the valid entries as a prefix — the
    # exact greedy order, so the NMS needs no further sort
    n_valid = jnp.broadcast_to(pre_eff, (b,)).astype(jnp.int32)
    nms_keep = greedy_nms_prefix(top_boxes, n_valid, cfg.nms_thresh)
    identity_order = jnp.broadcast_to(jnp.arange(pre_top)[None, :], (b, pre_top))
    rois, roi_scores, _, roi_valid = select_post_nms(
        top_boxes, top_scores, identity_order, nms_keep, post_top
    )
    return Proposals(rois=rois, scores=roi_scores, valid=roi_valid, rpn_ok=rpn_ok)
