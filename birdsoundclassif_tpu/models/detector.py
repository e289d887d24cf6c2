"""NbmModel: backbone -> (attn/FPN in configured order) -> RPN -> RCNN.

Functional assembly of the whole detector (reference: nbm_model.py:22-80,
head.py:9-42, build: nbm_model.py:344-381). The eval forward is one traced
function from a window batch to fixed-slot detections; the training forward
exposes the two stages separately for the criterion.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .backbone import backbone_init, backbone_apply, backbone_channels
from .attention import sa_pyramid_init, sa_pyramid_apply
from .fpn import build_fpn_init, build_fpn_apply
from .rpn import rpn_init, rpn_apply, proposal_layer, Proposals
from .rcnn import rcnn_init, rcnn_apply, fast_rcnn_inference, Detections
from .tf_rcnn import tf_rcnn_init as _tf_rcnn_init, tf_rcnn_apply as _tf_rcnn_apply
from .roi import roi_pool


def _second_stage_heads(params, pooled, pe, cfg, training, bn_updates):
    """Dispatch RCNN vs Transformer-RCNN (reference: FastRCNN.__init__,
    layers.py:662-665)."""
    if cfg.tf_rcnn:
        return _tf_rcnn_apply(params["head"]["rcnn"], pooled, pe, cfg)
    return rcnn_apply(params["head"]["rcnn"], pooled, pe, training, bn_updates)


class FirstStageOut(NamedTuple):
    rois: jnp.ndarray          # (B, postN, 4)
    roi_scores: jnp.ndarray    # (B, postN)
    roi_valid: jnp.ndarray     # (B, postN)
    rpn_ok: jnp.ndarray        # scalar bool
    rpn_cls_scores: jnp.ndarray  # (B, th, tw, L*A, 2)
    rpn_bbox_reg: jnp.ndarray    # (B, th, tw, L*A, 4)
    fpn_out: Tuple[jnp.ndarray, ...]


class NbmModel:
    """Stateless model namespace: params pytree + pure apply functions."""

    @staticmethod
    def init(key, cfg) -> Dict:
        keys = jax.random.split(key, 4)
        bb_channels = backbone_channels(cfg.backbone)
        if cfg.fpn_first:
            attn_channels = [cfg.out_fpn_chan] * len(bb_channels)
            attn = sa_pyramid_init(keys[1], attn_channels, cfg.pyramid_top_n_attn)
        elif cfg.sandwich_attn:
            attn = {
                "0": sa_pyramid_init(keys[1], bb_channels, cfg.pyramid_top_n_attn),
                "1": sa_pyramid_init(
                    jax.random.fold_in(keys[1], 1),
                    [cfg.out_fpn_chan] * len(bb_channels),
                    cfg.pyramid_top_n_attn,
                ),
            }
        else:
            attn = sa_pyramid_init(keys[1], bb_channels, cfg.pyramid_top_n_attn)
        return {
            "backbone": backbone_init(keys[0], cfg),
            "attn": attn,
            "fpn": build_fpn_init(keys[2], cfg, bb_channels),
            "head": {
                "rpn": rpn_init(keys[3], cfg),
                "rcnn": (
                    _tf_rcnn_init(jax.random.fold_in(keys[3], 1), cfg)
                    if cfg.tf_rcnn
                    else rcnn_init(jax.random.fold_in(keys[3], 1), cfg)
                ),
            },
        }

    # ---- first stage (reference: nbm_model.py:39-54, head.py:32-38) ----
    @staticmethod
    def forward_first_stage(
        params: Dict,
        samples: jnp.ndarray,  # (B, H, W, C_in) NHWC
        cfg,
        training: bool = False,
        bn_updates: Optional[dict] = None,
    ) -> FirstStageOut:
        # one cast here flips the whole conv stack to bf16 (params are cast
        # per-op to the activation dtype; accumulation stays f32); box
        # geometry, NMS and losses remain f32 downstream
        samples = samples.astype(jnp.dtype(cfg.compute_dtype))

        blocks_mode = (
            training and cfg.remat_backbone
            and cfg.remat_granularity in ("blocks", "stages")
            # segmentation is implemented for the resnet families;
            # vgg/efficientnet take the whole-trunk checkpoint branch below
            and "vgg" not in cfg.backbone
            and "efficientnet" not in cfg.backbone
        )

        def _attn(p_attn, feats, top_n):
            if not blocks_mode:
                return sa_pyramid_apply(p_attn, feats, top_n)
            return jax.checkpoint(
                lambda p, fs: sa_pyramid_apply(p, fs, top_n)
            )(p_attn, feats)

        def _fpn(p_fpn, feats, coll):
            if not blocks_mode:
                return build_fpn_apply(p_fpn, cfg, feats, training, coll)

            def f(p, fs):
                c: dict = {}
                return build_fpn_apply(
                    p, cfg, fs, training, c if coll is not None else None
                ), c

            out, c = jax.checkpoint(f)(p_fpn, feats)
            if coll is not None:
                coll.update(c)
            return out

        def _trunk(p_backbone, p_attn, p_fpn, x, coll):
            feats, pos = backbone_apply(
                p_backbone, x, cfg, training, coll,
                remat=cfg.remat_granularity if blocks_mode else "none")
            if cfg.add_posenc:
                feats = [f + p for f, p in zip(feats, pos)]
            top_n = cfg.pyramid_top_n_attn
            if cfg.fpn_first:
                fpn_out = _fpn(p_fpn, feats, coll)
                fpn_out = _attn(p_attn, fpn_out, top_n)
            elif cfg.sandwich_attn:
                feats = _attn(p_attn["0"], feats, top_n)
                fpn_out = _fpn(p_fpn, feats, coll)
                fpn_out = _attn(p_attn["1"], fpn_out, top_n)
            else:
                feats = _attn(p_attn, feats, top_n)
                fpn_out = _fpn(p_fpn, feats, coll)
            return fpn_out

        if blocks_mode:
            # segmented remat: every resnet bottleneck ("blocks") or stage
            # ("stages"), plus the attention pyramid and the FPN, each in
            # their own jax.checkpoint — the backward pass keeps only
            # segment boundaries live plus one segment's internals. Same
            # ~one-extra-forward recompute as the trunk-level checkpoint,
            # far lower peak HBM; "stages" keeps the HLO small enough for
            # the remote compile helper at large B (docs/BENCH.md r3).
            # Non-resnet families fall back to whole-trunk below.
            fpn_out = _trunk(
                params["backbone"], params["attn"], params["fpn"], samples,
                bn_updates,
            )
        elif training and cfg.remat_backbone:
            # rematerialize the whole trunk (backbone + attn + FPN) in the
            # backward pass; BN stats flow out as a pytree so the checkpoint
            # boundary stays clean
            def _trunk_ckpt(p_b, p_a, p_f, x):
                coll: dict = {}
                return _trunk(p_b, p_a, p_f, x, coll), coll

            fpn_out, bn_local = jax.checkpoint(_trunk_ckpt)(
                params["backbone"], params["attn"], params["fpn"], samples
            )
            if bn_updates is not None:
                bn_updates.update(bn_local)
        else:
            fpn_out = _trunk(
                params["backbone"], params["attn"], params["fpn"], samples, bn_updates
            )
        cls_scores, bbox_reg = rpn_apply(
            params["head"]["rpn"], fpn_out, cfg, training, bn_updates
        )
        # proposals carry no gradients (reference: head.py:36-37)
        props: Proposals = proposal_layer(
            jax.lax.stop_gradient(cls_scores),
            jax.lax.stop_gradient(bbox_reg),
            cfg,
            training=training,
        )
        return FirstStageOut(
            rois=props.rois,
            roi_scores=props.scores,
            roi_valid=props.valid,
            rpn_ok=props.rpn_ok,
            rpn_cls_scores=cls_scores,
            rpn_bbox_reg=bbox_reg,
            fpn_out=tuple(fpn_out),
        )

    # ---- second stage ----
    @staticmethod
    def forward_second_stage_train(
        params: Dict,
        fpn_out,
        rois: jnp.ndarray,
        cfg,
        bn_updates: Optional[dict] = None,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # training=False gives the reference's model.eval() head regime for
        # validation losses (running-stat BN, dropout off; train.py:362)
        pooled, pe, _ = roi_pool(rois, list(fpn_out), cfg)
        if getattr(cfg, "ablate_roi_pe", False):
            pe = jnp.zeros_like(pe)
        return _second_stage_heads(params, pooled, pe, cfg, training, bn_updates)

    @staticmethod
    def forward_second_stage_eval(
        params: Dict,
        fpn_out,
        rois: jnp.ndarray,
        roi_valid: jnp.ndarray,
        cfg,
        nms_thresh: float = 0.3,
        min_score: float = 0.5,
    ) -> Detections:
        pooled, pe, _ = roi_pool(rois, list(fpn_out), cfg)
        if getattr(cfg, "ablate_roi_pe", False):
            # diagnostic (config.py ablate_roi_pe): how much of the species
            # head's accuracy is read off the absolute-position RoI PE
            # rather than call morphology (ATTRIBUTION_r5.json)
            pe = jnp.zeros_like(pe)
        if getattr(cfg, "neutral_roi_pe", False):
            # positionally-uninformative but IN-DISTRIBUTION PE: every RoI
            # gets the PE of a fixed mid-spectrogram band at its own time
            # extent (zeroing collapses the FiLM-modulated head outright —
            # measured in ATTRIBUTION_r5.json — so zero-PE can't separate
            # "needs position" from "out of distribution")
            y_mid = cfg.img_height // 2
            fixed = jnp.stack([
                rois[..., 0],
                jnp.full_like(rois[..., 1], y_mid - 25.0),
                rois[..., 2],
                jnp.full_like(rois[..., 3], y_mid + 25.0),
            ], axis=-1)
            _, pe, _ = roi_pool(fixed, list(fpn_out), cfg)
        bbox_reg, bbox_classes = _second_stage_heads(params, pooled, pe, cfg, False, None)
        return fast_rcnn_inference(
            bbox_reg, bbox_classes, rois, roi_valid, cfg, nms_thresh, min_score
        )

    # ---- full eval forward (reference: nbm_model.py:66-80) ----
    @staticmethod
    def forward(
        params: Dict,
        samples: jnp.ndarray,
        cfg,
        nms_thresh: float = 0.3,
        min_score: float = 0.5,
    ) -> Detections:
        out = NbmModel.forward_first_stage(params, samples, cfg, training=False)
        return NbmModel.forward_second_stage_eval(
            params, out.fpn_out, out.rois, out.roi_valid, cfg, nms_thresh, min_score
        )


def build_model(key, cfg):
    """-> (params, cfg). Criterion lives in train/losses.py."""
    return NbmModel.init(key, cfg), cfg
