"""Fixed-shape training target assignment.

AnchorTargetLayer (reference: layers.py:102-216) and ProposalTargetLayer
(reference: layers.py:306-396) re-expressed as masked, fully-traced ops:
variable GT counts become padded (B, G) tensors with validity masks, the
np.random.choice subsampling becomes rank-of-uniform selection under mask
(statistically equivalent uniform sampling without replacement), and the
data-dependent early returns become ok-flags the loss masks on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import full_anchor_grid, inside_image_mask
from ..ops.boxes import encode_boxes, iou_matrix


def _rank_of_uniform(key, mask):
    """0-based random rank among mask=True entries (masked-out -> large).
    Rank-of-uniform == uniform sampling without replacement when thresholded."""
    n = mask.shape[-1]
    u = jnp.where(mask, jax.random.uniform(key, mask.shape), 2.0)
    ranks = jnp.argsort(jnp.argsort(u, axis=-1), axis=-1)  # inverse permutation
    return jnp.where(mask, ranks, n + 1)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray       # (B, K_all) in {-1, 0, 1}, grid (y, x, a) order
    reg_targets: jnp.ndarray  # (B, K_all, 4), zeroed on non-positives


class AnchorTargetLayer:
    """Precomputes the static anchor grid + inside mask once per config."""

    def __init__(self, cfg):
        self.cfg = cfg
        th, tw = cfg.top_size
        grid = full_anchor_grid(
            cfg.base_size, tuple(cfg.ratios), tuple(cfg.scales), tw, th, cfg.anchor_stride
        )
        inside = inside_image_mask(grid, cfg.img_width, cfg.img_height)
        self.all_anchors = jnp.asarray(grid)                # (K_all, 4)
        self.inside = jnp.asarray(inside)                   # (K_all,)
        self.anchors_in = jnp.asarray(grid[inside])         # (K_in, 4)
        self.inside_idx = jnp.asarray(np.nonzero(inside)[0])

    def __call__(
        self,
        key: jax.Array,
        gt_boxes: jnp.ndarray,   # (B, G, 4) padded
        gt_valid: jnp.ndarray,   # (B, G) bool
    ) -> AnchorTargets:
        cfg = self.cfg
        b = gt_boxes.shape[0]
        k_in = self.anchors_in.shape[0]
        num_fg = int(cfg.rpn_fg_fraction * cfg.rpn_batchsize)

        def per_image(k, gt, gtv):
            iou = iou_matrix(self.anchors_in, gt)            # (K_in, G)
            iou = jnp.where(gtv[None, :], iou, 0.0)
            max_ov = iou.max(axis=1)
            argmax_ov = iou.argmax(axis=1)
            # negatives / positives (reference: layers.py:170-179)
            labels = jnp.full((k_in,), -1, jnp.int32)
            labels = jnp.where(max_ov < cfg.rpn_neg_label, 0, labels)
            labels = jnp.where(max_ov >= cfg.rpn_pos_label, 1, labels)
            gt_max = jnp.where(gtv, iou.max(axis=0), 0.0)
            any_pos_gt = gt_max.max() > 0
            # anchors achieving the per-GT max (for GT cols with max > 0)
            achieves = (iou == gt_max[None, :]) & gtv[None, :] & (gt_max[None, :] > 0)
            labels = jnp.where(any_pos_gt & achieves.any(axis=1), 1, labels)

            k1, k2 = jax.random.split(k)
            # subsample positives to num_fg
            pos = labels == 1
            pos_rank = _rank_of_uniform(k1, pos)
            labels = jnp.where(pos & (pos_rank >= num_fg), -1, labels)
            # subsample negatives to rpn_batchsize - n_pos
            n_pos = (labels == 1).sum()
            num_bg = cfg.rpn_batchsize - n_pos
            neg = labels == 0
            neg_rank = _rank_of_uniform(k2, neg)
            labels = jnp.where(neg & (neg_rank >= num_bg), -1, labels)

            reg = encode_boxes(self.anchors_in, gt[argmax_ov])
            reg = jnp.clip(labels, 0)[:, None].astype(reg.dtype) * reg
            return labels, reg

        keys = jax.random.split(key, b)
        labels_in, reg_in = jax.vmap(per_image)(keys, gt_boxes, gt_valid)

        k_all = self.all_anchors.shape[0]
        labels = jnp.full((b, k_all), -1, jnp.int32).at[:, self.inside_idx].set(labels_in)
        reg = jnp.zeros((b, k_all, 4), jnp.float32).at[:, self.inside_idx].set(reg_in)
        return AnchorTargets(labels=labels, reg_targets=reg)


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray          # (B, S, 4)  S = rcnn_batch_size
    bbox_targets: jnp.ndarray  # (B, S, 4 * (num_classes + 1))
    labels: jnp.ndarray        # (B, S) int32
    ok: jnp.ndarray            # (B,) bool — per-image "could fill the batch"


def proposal_target_layer(
    key: jax.Array,
    rois: jnp.ndarray,       # (B, N, 4) from the proposal layer
    roi_valid: jnp.ndarray,  # (B, N)
    gt_boxes: jnp.ndarray,   # (B, G, 4)
    gt_valid: jnp.ndarray,   # (B, G)
    gt_labels: jnp.ndarray,  # (B, G) int32 bird ids (0 = non-bird/background)
    cfg,
) -> ProposalTargets:
    """reference: ProposalTargetLayer.forward (layers.py:312-396)."""
    b, n, _ = rois.shape
    g = gt_boxes.shape[1]
    s = cfg.rcnn_batch_size
    num_classes = cfg.num_classes
    fg_cap = int(cfg.rcnn_fg_prop * s)

    def per_image(k, roi, rv, gt, gtv, gl):
        all_rois = jnp.concatenate([roi, gt], axis=0)          # (N+G, 4)
        all_valid = jnp.concatenate([rv, gtv], axis=0)
        iou = iou_matrix(all_rois, gt)
        iou = jnp.where(gtv[None, :], iou, 0.0)
        iou = jnp.where(all_valid[:, None], iou, -1.0)         # invalid rois match nothing
        max_ov = iou.max(axis=1)
        assign = iou.argmax(axis=1)
        lbl = gl[assign]
        lbl = jnp.where(max_ov < cfg.fg_threshold, 0, lbl)
        assigned_gt = gt[assign]

        fg = all_valid & (max_ov > cfg.fg_threshold)
        bg = all_valid & (max_ov < cfg.bg_threshold_hi) & (max_ov >= cfg.bg_threshold_lo)
        oth = all_valid & ~fg & ~bg
        n_fg, n_bg, n_oth = fg.sum(), bg.sum(), oth.sum()

        fg_take = jnp.minimum(n_fg, fg_cap)
        short = (n_bg + n_oth) < (s - fg_take)
        fg_take = jnp.where(short, jnp.maximum(fg_take, s - (n_bg + n_oth)), fg_take)
        ok = (n_bg + n_oth) >= (s - n_fg)
        bg_take = jnp.minimum(n_bg, s - fg_take)
        oth_take = s - fg_take - bg_take

        k1, k2, k3 = jax.random.split(k, 3)
        fg_rank = _rank_of_uniform(k1, fg)
        bg_rank = _rank_of_uniform(k2, bg)
        oth_rank = _rank_of_uniform(k3, oth)
        big = n + g + 10
        slot = jnp.where(
            fg & (fg_rank < fg_take), fg_rank,
            jnp.where(
                bg & (bg_rank < bg_take), fg_take + bg_rank,
                jnp.where(oth & (oth_rank < oth_take), fg_take + bg_take + oth_rank, big),
            ),
        )
        order = jnp.argsort(slot)
        if order.shape[0] < s:  # tiny test configs; production N >> s
            order = jnp.pad(order, (0, s - order.shape[0]))
        keep = order[:s]
        b_rois = all_rois[keep]
        b_labels = lbl[keep].astype(jnp.int32)
        tgt = encode_boxes(b_rois, assigned_gt[keep])          # (S, 4)
        # one 4-slot per class (reference: get_bbox_regression_targets,
        # nets_utils.py:248-259); class 0 slot stays zero
        onehot = jax.nn.one_hot(b_labels, num_classes + 1, dtype=tgt.dtype)
        onehot = onehot.at[:, 0].set(0.0)
        expanded = (onehot[:, :, None] * tgt[:, None, :]).reshape(s, 4 * (num_classes + 1))
        return b_rois, expanded, b_labels, ok

    keys = jax.random.split(key, b)
    rois_s, tgts, lbls, ok = jax.vmap(per_image)(
        keys, rois, roi_valid, gt_boxes, gt_valid, gt_labels
    )
    return ProposalTargets(rois=rois_s, bbox_targets=tgts, labels=lbls, ok=ok)
