"""Training step + optimizer (reference: train.py:205-257,295-304).

One fully-traced train step covers both stages: forward, target assignment,
losses, AdamW update with per-group learning rates (backbone at
lr_backbone), global-norm gradient clip, StepLR schedule (stepped every
1000 train steps, gamma 0.1 every `lr_drop` scheduler steps), and the
BatchNorm running-stat merge. RPN/PTL failures are masked, not branched.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.detector import NbmModel
from .targets import AnchorTargetLayer, proposal_target_layer
from . import losses as L


def make_lr_schedule(base_lr: float, lr_drop: int):
    """StepLR(step_size=lr_drop) stepped once per 1000 train steps
    (reference: train.py:304,356-358)."""

    def schedule(count):
        sched_steps = count // 1000
        return base_lr * jnp.power(0.1, sched_steps // lr_drop)

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    def group(base_lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.clip_max_norm),
            optax.adamw(
                learning_rate=make_lr_schedule(base_lr, cfg.lr_drop),
                b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=cfg.weight_decay,
            ),
        )

    def label_fn(params):
        return {k: ("backbone" if k == "backbone" else "rest") for k in params}

    return optax.multi_transform(
        {"backbone": group(cfg.lr_backbone), "rest": group(cfg.lr)}, label_fn
    )


def _set_in(tree: Dict, path: str, leaf_updates: Dict) -> Dict:
    """Functionally update tree[path]['mean'/'var'] (copy-on-path)."""
    parts = path.split("/")
    node = tree
    stack = []
    for p in parts:
        stack.append((node, p))
        node = node[p]
    node = {**node, **leaf_updates}
    for parent, p in reversed(stack):
        node = {**parent, p: node}
    return node


def merge_bn_updates(params: Dict, bn_updates: Dict[str, Dict]) -> Dict:
    for path, stats in bn_updates.items():
        params = _set_in(params, path, stats)
    return params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(key, cfg) -> Tuple[TrainState, optax.GradientTransformation]:
    params = NbmModel.init(key, cfg)
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg, tx):
    atl = AnchorTargetLayer(cfg)
    wd = L.weight_dict(cfg)

    def compute_losses(params, batch, key, negative_sample: bool):
        from ..models.nn import depthwise_taps_mode

        with depthwise_taps_mode():
            return _compute_losses_inner(params, batch, key, negative_sample)

    def _compute_losses_inner(params, batch, key, negative_sample: bool):
        bn: Dict = {}
        img = batch["neg_img"] if negative_sample else batch["img"]
        out1 = NbmModel.forward_first_stage(
            params, img[..., None], cfg, training=True, bn_updates=bn
        )
        losses: Dict[str, jnp.ndarray] = {}
        rpn_ok = out1.rpn_ok.astype(jnp.float32)
        if negative_sample:
            losses.update(L.first_stage_neg_loss(out1.rpn_cls_scores, cfg))
            _, bbox_classes = NbmModel.forward_second_stage_train(
                params, out1.fpn_out, jax.lax.stop_gradient(out1.rois), cfg, bn
            )
            neg = L.second_stage_neg_loss(bbox_classes, out1.roi_valid)
            losses.update({k: v * rpn_ok for k, v in neg.items()})
        else:
            k_atl, k_ptl = jax.random.split(key)
            at = atl(k_atl, batch["gt_boxes"], batch["gt_valid"])
            losses.update(L.first_stage_loss(out1.rpn_cls_scores, out1.rpn_bbox_reg, at))
            pt = proposal_target_layer(
                k_ptl,
                jax.lax.stop_gradient(out1.rois),
                out1.roi_valid,
                batch["gt_boxes"],
                batch["gt_valid"],
                batch["gt_labels"],
                cfg,
            )
            bbox_reg, bbox_classes = NbmModel.forward_second_stage_train(
                params, out1.fpn_out, pt.rois, cfg, bn
            )
            sec = L.second_stage_loss(bbox_reg, bbox_classes, pt, cfg)
            losses.update({k: v * rpn_ok for k, v in sec.items()})
            losses["cardinality_error"] = L.cardinality_error(bbox_classes, pt.labels)
        total = sum(losses[k] * wd[k] for k in losses if k in wd)
        return total, (losses, bn)

    @partial(jax.jit, static_argnames=("negative_sample",),
             donate_argnums=(0,))
    def train_step(state: TrainState, batch, key, negative_sample: bool = False):
        # state is donated: params/opt_state buffers (~0.9 GB at flagship
        # scale) are updated in place instead of doubling HBM residency.
        # Every call site rebinds `state, losses = train_step(state, ...)`.
        (total, (losses, bn)), grads = jax.value_and_grad(
            compute_losses, has_aux=True
        )(state.params, batch, key, negative_sample)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = merge_bn_updates(params, bn)
        losses["total"] = total
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), losses

    @partial(jax.jit, static_argnames=("negative_sample",))
    def eval_step(params, batch, key, negative_sample: bool = False):
        _, (losses, _) = compute_losses(params, batch, key, negative_sample)
        return losses

    return train_step, eval_step
