"""Two-stage detection losses (reference: SetCriterion, nbm_model.py:83-226
with loss primitives in nets_utils.py:262-358), fixed-shape + masked.

All reductions reproduce the reference's normalizations exactly:
  * stage-1 CE: sum over non-ignored anchors / count
  * stage-1 smooth-L1: (masked sum) * 4 / n_positive, 0 when no positives
  * stage-2 CE: sum / (B * rcnn_batch_size); focal variant (gamma=1.5, mean)
  * stage-2 smooth-L1: per-class-slot mask, background excluded, * 4 / n_pos
  * hard-negative stages: background CE on the top-confidence predictions
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .targets import AnchorTargetLayer, AnchorTargets, ProposalTargets


def smooth_l1(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (reference: smooth_l1_loss_rcnn,
    nets_utils.py:275-281)."""
    d = jnp.abs(x - t)
    return jnp.where(d >= 1.0, d - 0.5, 0.5 * d * d)


def _safe_log(p):
    return jnp.log(jnp.maximum(p, 1e-12))


def first_stage_loss(
    cls_scores: jnp.ndarray,   # (B, th, tw, LA, 2) softmaxed
    bbox_reg: jnp.ndarray,     # (B, th, tw, LA, 4)
    targets: AnchorTargets,
) -> Dict[str, jnp.ndarray]:
    """reference: nbm_model.py:124-164 (positive-sample branch)."""
    b = cls_scores.shape[0]
    probs = cls_scores.reshape(b, -1, 2)       # grid (y, x, a) order == targets
    reg = bbox_reg.reshape(b, -1, 4)
    labels = targets.labels                     # (B, K)
    keep = labels != -1
    n_keep = jnp.maximum(keep.sum(), 1)

    gt_prob = jnp.where(labels == 1, probs[..., 1], probs[..., 0])
    ce = -_safe_log(gt_prob)
    class_loss = jnp.where(keep, ce, 0.0).sum() / n_keep

    sl1 = smooth_l1(reg, targets.reg_targets)
    pos = (labels == 1) & keep
    n_pos = (labels > 0).sum()
    reg_sum = jnp.where(pos[..., None], sl1, 0.0).sum()
    regression_loss = jnp.where(
        reg_sum > 0, reg_sum * (4.0 / jnp.maximum(n_pos, 1)), 0.0
    )
    return {"first_class_loss": class_loss, "first_regression_loss": regression_loss}


def first_stage_neg_loss(cls_scores: jnp.ndarray, cfg) -> Dict[str, jnp.ndarray]:
    """Hard-negative stage-1 (reference: nbm_model.py:113-123).

    The reference *intends* background CE on the rcnn_batch_size*20 most
    confident predictions, but `cross_entropy_loss_rcnn` broadcast-indexes
    the (bs, k, 2) tensor with (bs,) x (bs, k, 1) indices, which collapses
    to `max_labels_pred[c, 0]` — so the loss it actually computes is the
    mean over images of BOTH -log softmax components of the single
    top-1 most-confident prediction (verified against the genuine module,
    tests/test_refmod_targets.py; PARITY.md deviation 9). Reproduced
    faithfully: this is the loss the published checkpoint was trained
    with, and it is minimized at p=(0.5, 0.5), not at background."""
    if getattr(cfg, "fixed_neg_objective", False):
        return first_stage_neg_loss_fixed(cls_scores, cfg)
    b = cls_scores.shape[0]
    probs = cls_scores.reshape(b, -1, 2)
    top1 = probs[..., 1].argmax(axis=1)                    # (B,)
    pair = jnp.take_along_axis(probs, top1[:, None, None], axis=1)[:, 0, :]
    loss = -_safe_log(pair).mean()
    return {"first_neg_class_loss": loss}


def first_stage_neg_loss_fixed(cls_scores: jnp.ndarray, cfg) -> Dict[str, jnp.ndarray]:
    """The stage-1 hard-negative objective the reference *intends*
    (nbm_model.py:113-118 before the indexing collapse): background
    cross-entropy over the rcnn_batch_size*20 most foreground-confident
    anchor predictions per image. Opt-in via cfg.fixed_neg_objective —
    this deliberately deviates from the published-checkpoint objective
    (PARITY.md deviation 10), pushing the top-k toward p_bg=1 instead of
    the degenerate p=(0.5, 0.5) optimum of the faithful loss."""
    b = cls_scores.shape[0]
    probs = cls_scores.reshape(b, -1, 2)
    k = min(int(cfg.rcnn_batch_size) * 20, probs.shape[1])
    _, topi = jax.lax.top_k(probs[..., 1], k)              # (B, k)
    bg = jnp.take_along_axis(probs[..., 0], topi, axis=1)  # p(background)
    loss = -_safe_log(bg).mean()
    return {"first_neg_class_loss": loss}


def second_stage_loss(
    bbox_reg: jnp.ndarray,      # (B*S, 4*(C+1))
    bbox_classes: jnp.ndarray,  # (B*S, C+1) softmaxed
    targets: ProposalTargets,
    cfg,
) -> Dict[str, jnp.ndarray]:
    """reference: nbm_model.py:187-217."""
    b, s = targets.labels.shape
    labels = targets.labels.reshape(-1)
    tgts = targets.bbox_targets.reshape(b * s, -1)
    img_ok = jnp.repeat(targets.ok, s)

    gt_prob = jnp.take_along_axis(bbox_classes, labels[:, None], axis=1)[:, 0]
    if cfg.focal_loss:
        gamma = 1.5
        ce = -((1.0 - gt_prob) ** gamma) * _safe_log(gt_prob)
        class_loss = jnp.where(img_ok, ce, 0.0).sum() / jnp.maximum(img_ok.sum(), 1)
    else:
        ce = -_safe_log(gt_prob)
        class_loss = jnp.where(img_ok, ce, 0.0).sum() / (b * s)

    sl1 = smooth_l1(bbox_reg, tgts)
    # regression applies only to the 4 columns of the GT class slot,
    # background (label 0) excluded (reference: nbm_model.py:205-210)
    col = jnp.arange(bbox_reg.shape[1])[None, :]
    mask = (col >= (labels * 4)[:, None]) & (col < (labels * 4 + 4)[:, None])
    mask = mask & (labels != 0)[:, None] & img_ok[:, None]
    n_pos = jnp.where(img_ok, (labels > 0), False).sum()
    reg_sum = jnp.where(mask, sl1, 0.0).sum()
    regression_loss = jnp.where(reg_sum > 0, reg_sum * (4.0 / jnp.maximum(n_pos, 1)), 0.0)
    return {"sec_class_loss": class_loss, "sec_regression_loss": regression_loss}


def second_stage_neg_loss(
    bbox_classes: jnp.ndarray,
    roi_valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """reference: nbm_model.py:182-186 — background CE over the proposal
    RoIs. The reference's RoI count is dynamic; our fixed slots carry a
    validity mask, so padded slots are excluded from the mean."""
    ce = -_safe_log(bbox_classes[:, 0])
    if roi_valid is None:
        return {"sec_neg_class_loss": ce.mean()}
    v = roi_valid.reshape(-1)
    return {
        "sec_neg_class_loss": jnp.where(v, ce, 0.0).sum() / jnp.maximum(v.sum(), 1)
    }


def cardinality_error(bbox_classes: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Diagnostic |#predicted non-bg - #gt non-bg| (reference:
    nbm_model.py:219-226)."""
    pred = (bbox_classes.argmax(-1) != 0).sum()
    gt = (labels != 0).sum()
    return (pred - gt).astype(jnp.float32)


def weight_dict(cfg) -> Dict[str, float]:
    """reference: build(), nbm_model.py:369-376."""
    return {
        "first_class_loss": cfg.fs_cls_loss_coef,
        "first_regression_loss": cfg.fs_reg_loss_coef,
        "sec_class_loss": cfg.sec_cls_loss_coef,
        "sec_regression_loss": cfg.sec_reg_loss_coef,
        "first_neg_class_loss": cfg.fs_neg_cls_loss_coef,
        "sec_neg_class_loss": cfg.sec_neg_cls_loss_coef,
    }
