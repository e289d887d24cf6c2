"""Reference parameter/buffer accounting in the optimizer (VERDICT r2 review):

- FrozenBatchNorm2d leaves are torch *buffers* (reference backbone.py:26-62):
  never updated by AdamW, never part of the global clip norm.
- lr_backbone <= 0 freezes the whole backbone (build_backbone:
  train_backbone = args.lr_backbone > 0, backbone.py:153).
- Gradient clipping is ONE global norm over all trainable params
  (train.py:213-214), skipped when clip_max_norm <= 0.
- Validation losses run under model.eval() semantics (train.py:362).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.train.loop import (
    create_train_state,
    freeze_mask,
    make_train_step,
)


def tiny_cfg(**kw):
    cfg = NbmConfig()
    cfg.num_classes = 6
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN = 256
    cfg.post_nms_topN = 64
    cfg.max_gt_boxes = 4
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def tiny_batch(cfg, b=2):
    g = cfg.max_gt_boxes
    rng = np.random.default_rng(0)
    gt = np.array([[30.0, 20.0, 120.0, 60.0], [150.0, 70.0, 230.0, 110.0]],
                  np.float32)
    return {
        "img": jnp.asarray(rng.random((b, cfg.img_height, cfg.img_width),
                                      np.float32)),
        "neg_img": jnp.asarray(rng.random((b, cfg.img_height, cfg.img_width),
                                          np.float32)),
        "gt_boxes": jnp.tile(
            jnp.asarray(np.concatenate([gt, np.zeros((g - 2, 4), np.float32)]))[None],
            (b, 1, 1)),
        "gt_valid": jnp.tile(jnp.asarray([True, True] + [False] * (g - 2)), (b, 1)),
        "gt_labels": jnp.tile(jnp.asarray([3, 5] + [0] * (g - 2), np.int32), (b, 1)),
    }


def _flat(tree):
    return {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


class TestFreezeMask:
    def test_frozen_bn_and_running_stats(self):
        cfg = tiny_cfg()  # resnet50 + frozen_batchnorm default
        params = create_train_state(jax.random.PRNGKey(0), cfg)[0].params
        mask = _flat(freeze_mask(params, cfg))
        assert jax.tree_util.tree_structure(
            freeze_mask(params, cfg)
        ) == jax.tree_util.tree_structure(params)
        bn_backbone = [k for k in mask if k.startswith("['backbone']")
                       and k.endswith(("['scale']", "['bias']", "['mean']", "['var']"))]
        assert bn_backbone and all(mask[k] for k in bn_backbone)
        # conv kernels everywhere stay trainable
        kernels = [k for k in mask if k.endswith("['w']")]
        assert kernels and not any(mask[k] for k in kernels)
        # live BN outside the backbone: stats frozen, affine trainable
        head_stats = [k for k in mask if not k.startswith("['backbone']")
                      and k.endswith(("['mean']", "['var']"))]
        head_affine = [k for k in mask if not k.startswith("['backbone']")
                       and k.endswith(("['scale']", "['bias']"))]
        assert head_stats and all(mask[k] for k in head_stats)
        assert head_affine and not any(mask[k] for k in head_affine)

    def test_efficientnet_b0_honors_frozen_batchnorm(self):
        """The reference passes norm_layer=FrozenBatchNorm2d to the b0-b4
        family (backbone.py:123-131, exempting vgg/v2): the mask freezes
        every backbone BN leaf, and the training forward uses the frozen
        (running-stat) normalization — no bn_updates are collected."""
        from birdsoundclassif_tpu.models.backbone import backbone_init, backbone_apply

        cfg = tiny_cfg(backbone="efficientnet_b0")
        cfg.set_derived()
        params = {"backbone": backbone_init(jax.random.PRNGKey(0), cfg)}
        mask = _flat(freeze_mask(params, cfg))
        bn = [k for k in mask if k.endswith(
            ("['scale']", "['bias']", "['mean']", "['var']"))]
        assert bn and all(mask[k] for k in bn)
        upd = {}
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 128, 1), np.float32))
        backbone_apply(params["backbone"], x, cfg, training=True, bn_updates=upd)
        assert upd == {}, "frozen BN must not emit running-stat updates"
        # v2 is exempt: live BN emits stats in training
        cfg2 = tiny_cfg(backbone="efficientnet_v2_s")
        cfg2.set_derived()
        params2 = {"backbone": backbone_init(jax.random.PRNGKey(0), cfg2)}
        mask2 = _flat(freeze_mask(params2, cfg2))
        affine2 = [k for k in mask2 if k.endswith(("['scale']", "['bias']"))]
        assert affine2 and not any(mask2[k] for k in affine2)
        upd2 = {}
        backbone_apply(params2["backbone"], x, cfg2, training=True, bn_updates=upd2)
        assert upd2, "v2 live BN must emit running-stat updates"

    def test_lr_backbone_zero_freezes_backbone(self):
        cfg = tiny_cfg(lr_backbone=0.0)
        params = create_train_state(jax.random.PRNGKey(0), cfg)[0].params
        mask = _flat(freeze_mask(params, cfg))
        backbone = [k for k in mask if k.startswith("['backbone']")]
        assert backbone and all(mask[k] for k in backbone)
        rest = [k for k in mask if not k.startswith("['backbone']")
                and not k.endswith(("['mean']", "['var']"))]
        assert rest and not any(mask[k] for k in rest)


class TestTrainStepFreeze:
    def test_frozen_bn_leaves_constant_after_step(self):
        cfg = tiny_cfg()
        key = jax.random.PRNGKey(0)
        state, tx = create_train_state(key, cfg)
        before = _flat(jax.tree_util.tree_map(np.asarray, state.params))
        mask = _flat(freeze_mask(state.params, cfg))
        train_step, _ = make_train_step(cfg, tx)
        new_state, losses = train_step(state, tiny_batch(cfg), key,
                                       negative_sample=False)
        after = _flat(jax.tree_util.tree_map(np.asarray, new_state.params))
        assert np.isfinite(float(losses["total"]))
        changed = frozen_bad = live_stats_moved = 0
        for k in before:
            same = np.array_equal(before[k], after[k])
            if mask[k] and k.startswith("['backbone']"):
                frozen_bad += 0 if same else 1
            elif not same:
                changed += 1
                if k.endswith(("['mean']", "['var']")):
                    live_stats_moved += 1  # merge_bn_updates, not AdamW
        assert frozen_bad == 0, "frozen-BN buffers drifted under AdamW"
        assert changed > 50, "trainable params did not update"
        assert live_stats_moved > 0, "live BN running stats were not merged"

    def test_clip_zero_disables_clipping_not_training(self):
        cfg = tiny_cfg(clip_max_norm=0.0)
        key = jax.random.PRNGKey(0)
        state, tx = create_train_state(key, cfg)
        w_before = np.asarray(
            jax.tree_util.tree_leaves(state.params["head"])[0]).copy()
        train_step, _ = make_train_step(cfg, tx)
        new_state, losses = train_step(state, tiny_batch(cfg), key,
                                       negative_sample=False)
        assert np.isfinite(float(losses["total"]))
        w_after = np.asarray(jax.tree_util.tree_leaves(new_state.params["head"])[0])
        assert not np.array_equal(w_before, w_after), (
            "clip_max_norm=0 must disable clipping (reference train.py:213), "
            "not zero every update")


def test_eval_step_uses_eval_proposal_budget():
    """eval_step must run the model.eval() regime: the proposal layer's
    eval topN (reference layers.py:244-246) — observable as a different
    RoI count from the training step's — and still-finite losses."""
    cfg = tiny_cfg(post_nms_topN_eval=16)
    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, cfg)
    _, eval_step = make_train_step(cfg, tx)
    losses = eval_step(state.params, tiny_batch(cfg), key, negative_sample=False)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    from birdsoundclassif_tpu.models.detector import NbmModel

    out_eval = NbmModel.forward_first_stage(
        state.params, tiny_batch(cfg)["img"][..., None], cfg, training=False)
    out_train = NbmModel.forward_first_stage(
        state.params, tiny_batch(cfg)["img"][..., None], cfg, training=True)
    assert out_eval.rois.shape[1] == cfg.post_nms_topN_eval
    assert out_train.rois.shape[1] == cfg.post_nms_topN
