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
        return optax.adamw(
            learning_rate=make_lr_schedule(base_lr, cfg.lr_drop),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
        )

    def label_fn(params):
        return {k: ("backbone" if k == "backbone" else "rest") for k in params}

    tx = optax.multi_transform(
        {"backbone": group(cfg.lr_backbone), "rest": group(cfg.lr)}, label_fn
    )
    # ONE global-norm clip over all gradients before the per-group updates —
    # the reference clips model.parameters() jointly, not per param group,
    # and skips clipping entirely when max_norm <= 0 (train.py:213-214;
    # optax's clip_by_global_norm(0) would zero every update instead)
    if cfg.clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_max_norm), tx)
    return tx


def freeze_mask(params: Dict, cfg) -> Dict:
    """Pytree of bools matching `params`: True = frozen (a torch *buffer* or
    a requires_grad=False parameter in the reference), so its gradient is
    zeroed before the global-norm clip and its value restored after the
    optimizer update. Mirrors the reference's accounting exactly:

    - FrozenBatchNorm2d leaves are buffers (backbone.py:26-62,55-62): all
      four of scale/bias/mean/var are frozen whenever the backbone family
      honors norm_layer_backbone='frozen_batchnorm' (resnets and
      efficientnet b0-b4; vgg and efficientnet_v2 are exempt per
      backbone.py:123-131 and run live BN).
    - lr_backbone <= 0 freezes the whole backbone subtree
      (build_backbone: train_backbone = args.lr_backbone > 0,
      backbone.py:153; BackboneBase requires_grad_(False), :71-75).
    - Running mean/var of live BN are buffers everywhere: their grads are
      zero by construction (training mode normalizes with batch stats) and
      merge_bn_updates rewrites them, but freezing also keeps AdamW weight
      decay off them.
    """
    bn_keys = {"scale", "bias", "mean", "var"}
    # families honoring norm_layer_backbone='frozen_batchnorm': resnets and
    # efficientnet b0-b4; vgg and efficientnet_v2 are exempt in the
    # reference (backbone.py:123-131) and always run live BN
    frozen_bn_backbone = (
        cfg.norm_layer_backbone == "frozen_batchnorm"
        and "vgg" not in cfg.backbone
        and not cfg.backbone.startswith("efficientnet_v2")
    )

    def walk(node, in_backbone: bool, all_frozen: bool):
        if isinstance(node, dict):
            if set(node.keys()) == bn_keys and all(
                not isinstance(v, dict) for v in node.values()
            ):
                bn_frozen = all_frozen or (in_backbone and frozen_bn_backbone)
                return {
                    k: bool(bn_frozen or k in ("mean", "var")) for k in node
                }
            return {k: walk(v, in_backbone, all_frozen) for k, v in node.items()}
        return bool(all_frozen)

    return {
        k: walk(v, k == "backbone", k == "backbone" and cfg.lr_backbone <= 0)
        for k, v in params.items()
    }


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

    def compute_losses(params, batch, key, negative_sample: bool,
                       train_mode: bool = True, banks=None):
        from ..models.nn import depthwise_taps_mode

        with depthwise_taps_mode():
            return _compute_losses_inner(params, batch, key, negative_sample,
                                         train_mode, banks)

    def _compute_losses_inner(params, batch, key, negative_sample: bool,
                              train_mode: bool, banks):
        # train_mode=False is the reference's model.eval() validation regime
        # (train.py:362,398): running-stat BN, no dropout, and the proposal
        # layer's eval topN (500/50 instead of 3000/1000, layers.py:244-246)
        bn: Dict = {}
        if cfg.device_augment:
            from ..data.device_aug import assemble_image

            img = assemble_image(batch, banks, negative_sample)
        else:
            img = batch["neg_img"] if negative_sample else batch["img"]
        out1 = NbmModel.forward_first_stage(
            params, img[..., None], cfg, training=train_mode, bn_updates=bn
        )
        losses: Dict[str, jnp.ndarray] = {}
        rpn_ok = out1.rpn_ok.astype(jnp.float32)
        if negative_sample:
            losses.update(L.first_stage_neg_loss(out1.rpn_cls_scores, cfg))
            _, bbox_classes = NbmModel.forward_second_stage_train(
                params, out1.fpn_out, jax.lax.stop_gradient(out1.rois), cfg, bn,
                training=train_mode,
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
                params, out1.fpn_out, pt.rois, cfg, bn, training=train_mode
            )
            sec = L.second_stage_loss(bbox_reg, bbox_classes, pt, cfg)
            losses.update({k: v * rpn_ok for k, v in sec.items()})
            losses["cardinality_error"] = L.cardinality_error(bbox_classes, pt.labels)
        total = sum(losses[k] * wd[k] for k in losses if k in wd)
        return total, (losses, bn)

    def _accum_grads(params, batch, key, negative_sample: bool, banks=None):
        """Gradient accumulation over cfg.grad_accum_steps microbatches,
        scanned inside the one traced step. Peak activation memory is one
        microbatch's backward; the optimizer sees the full-batch gradient
        mean. Semantics note: per-batch loss normalizations (e.g. the
        positive-anchor count in first_stage_loss) apply per microbatch and
        are then averaged — standard grad-accum behavior, not bitwise equal
        to the single-batch step. BN running-stat updates are averaged
        across microbatches, which for momentum updates equals one update
        with the mean batch statistic."""
        A = cfg.grad_accum_steps
        keys = jax.random.split(key, A)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((A, x.shape[0] // A) + x.shape[1:]), batch
        )

        def body(carry, xs):
            mb, k = xs
            # banks enter the scan body as loop constants (read-only lookup
            # tables — they must not be reshaped into microbatches)
            (total, (losses, bn)), grads = jax.value_and_grad(
                compute_losses, has_aux=True
            )(params, mb, k, negative_sample, banks=banks)
            carry = jax.tree_util.tree_map(jnp.add, carry, grads)
            losses["total"] = total
            return carry, (losses, bn)

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.result_type(p, jnp.float32)),
            params,
        )
        gsum, (losses, bn) = jax.lax.scan(body, zero, (micro, keys))
        grads = jax.tree_util.tree_map(lambda g: g / A, gsum)
        losses = jax.tree_util.tree_map(jnp.mean, losses)
        bn = jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), bn)
        total = losses.pop("total")
        return (total, (losses, bn)), grads

    @partial(jax.jit, static_argnames=("negative_sample",),
             donate_argnums=(0,))
    def train_step(state: TrainState, batch, key, negative_sample: bool = False,
                   banks=None):
        # state is donated: params/opt_state buffers (~0.9 GB at flagship
        # scale) are updated in place instead of doubling HBM residency.
        # Every call site rebinds `state, losses = train_step(state, ...)`.
        # `banks` (device_augment mode) are committed device arrays passed
        # by handle each call — never closed over, which would embed them
        # as HLO literals in the AOT-compiled program.
        if cfg.grad_accum_steps > 1:
            (total, (losses, bn)), grads = _accum_grads(
                state.params, batch, key, negative_sample, banks=banks)
        else:
            (total, (losses, bn)), grads = jax.value_and_grad(
                compute_losses, has_aux=True
            )(state.params, batch, key, negative_sample, banks=banks)
        # torch buffers / requires_grad=False params produce no gradients in
        # the reference, so they must not contribute to the global clip norm
        # (zeroed grads) nor drift under AdamW's decoupled weight decay
        # (values restored after the update). Their Adam moments stay zero.
        frozen = freeze_mask(state.params, cfg)
        grads = jax.tree_util.tree_map(
            lambda g, f: jnp.zeros_like(g) if f else g, grads, frozen
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old, f: old if f else new, params, state.params, frozen
        )
        params = merge_bn_updates(params, bn)
        losses["total"] = total
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), losses

    @partial(jax.jit, static_argnames=("negative_sample",))
    def eval_step(params, batch, key, negative_sample: bool = False,
                  banks=None):
        # reference validation runs under model.eval() (train.py:362):
        # running-stat BN, dropout off, eval proposal topN
        _, (losses, _) = compute_losses(params, batch, key, negative_sample,
                                        train_mode=False, banks=banks)
        return losses

    return train_step, eval_step
