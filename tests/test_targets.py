"""Anchor/proposal target layer tests vs deterministic oracles.

Subsampling is random (rank-of-uniform vs the reference's np.random.choice),
so tests pin down the deterministic parts: label assignment, the forced
per-GT argmax positives, count invariants, fg/bg partition and fill rules,
and regression-target encoding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.train.targets import AnchorTargetLayer, proposal_target_layer
from birdsoundclassif_tpu.ops.anchors import full_anchor_grid, inside_image_mask

import torch_oracles as oracle


@pytest.fixture(scope="module")
def cfg():
    c = NbmConfig()
    c.max_gt_boxes = 4
    return c


@pytest.fixture(scope="module")
def atl(cfg):
    return AnchorTargetLayer(cfg)


def pad_gt(boxes, ids, g):
    b = np.zeros((g, 4), np.float32)
    v = np.zeros((g,), bool)
    l = np.zeros((g,), np.int32)
    b[: len(boxes)] = boxes
    v[: len(boxes)] = True
    l[: len(ids)] = ids
    return b, v, l


class TestAnchorTargetLayer:
    def test_label_assignment_rules(self, cfg, atl):
        """One well-anchored GT box: checks negatives (<0.3), positives
        (>=0.7 plus per-GT argmax), and the reg-target zeroing."""
        gt = np.array([[320.0, 96.0, 335.0, 111.0]], np.float32)  # 16x16 at a grid point
        gt_b, gt_v, _ = pad_gt(gt, [3], cfg.max_gt_boxes)
        out = atl(jax.random.PRNGKey(0), jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]))
        labels = np.asarray(out.labels[0])
        reg = np.asarray(out.reg_targets[0])

        grid = full_anchor_grid(16, (0.5, 1.0, 2.0), (1, 2, 4, 8, 16), 64, 24, 16)
        inside = inside_image_mask(grid, 1024, 375)
        iou = oracle.iou_matrix_oracle(grid.astype(np.float32), gt)
        max_iou = iou[:, 0]

        # outside anchors are always ignored
        assert (labels[~inside] == -1).all()
        # any anchor labeled 0 must have iou < 0.3; labeled 1 must be
        # >= 0.7 or achieve the per-GT max
        gt_max = max_iou[inside].max()
        lab_in = labels[inside]
        iou_in = max_iou[inside]
        assert (iou_in[lab_in == 0] < 0.3).all()
        pos_iou = iou_in[lab_in == 1]
        assert ((pos_iou >= 0.7) | np.isclose(pos_iou, gt_max)).all()
        # subsampling caps
        assert (labels == 1).sum() <= 8
        assert (labels != -1).sum() <= cfg.rpn_batchsize
        # non-positive anchors have zero reg targets
        assert np.abs(reg[labels != 1]).sum() == 0
        # positive anchors encode toward the GT box
        pos_idx = np.nonzero(labels == 1)[0]
        if len(pos_idx):
            want = oracle.encode_oracle(grid[pos_idx].astype(np.float64),
                                        np.repeat(gt.astype(np.float64), len(pos_idx), 0))
            np.testing.assert_allclose(reg[pos_idx], want, atol=1e-4)

    def test_batchsize_invariant(self, cfg, atl, rng):
        gt = np.round(
            np.stack([
                rng.uniform(0, 800, 3), rng.uniform(0, 250, 3),
                np.zeros(3), np.zeros(3),
            ], 1)
        ).astype(np.float32)
        gt[:, 2] = gt[:, 0] + np.round(rng.uniform(20, 120, 3))
        gt[:, 3] = gt[:, 1] + np.round(rng.uniform(20, 80, 3))
        gt_b, gt_v, _ = pad_gt(gt, [1, 2, 3], cfg.max_gt_boxes)
        out = atl(jax.random.PRNGKey(1), jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]))
        labels = np.asarray(out.labels[0])
        # exactly rpn_batchsize anchors participate when enough candidates
        assert (labels != -1).sum() == cfg.rpn_batchsize
        assert (labels == 1).sum() >= 1


class TestProposalTargetLayer:
    def test_partition_and_fill(self, cfg, rng):
        """Enough fg and bg: 6 fg (0.4*16) + 10 bg, labels match IoU rules."""
        gt = np.array([[100, 100, 200, 180], [600, 50, 700, 150]], np.float32)
        gt_b, gt_v, gt_l = pad_gt(gt, [7, 9], cfg.max_gt_boxes)
        # rois: 8 near-copies of gt0 (fg), 20 shifted (bg range), 12 far (other)
        fg_rois = gt[0] + rng.uniform(-5, 5, (8, 4)).astype(np.float32)
        bg_rois = gt[0] + np.array([80, 0, 80, 0], np.float32) + \
            rng.uniform(-3, 3, (20, 4)).astype(np.float32)
        far_rois = np.tile(np.array([[900, 300, 1000, 370]], np.float32), (12, 1)) + \
            rng.uniform(-3, 3, (12, 4)).astype(np.float32)
        rois = np.concatenate([fg_rois, bg_rois, far_rois])[None]
        valid = np.ones((1, 40), bool)
        out = proposal_target_layer(
            jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(valid),
            jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]), jnp.asarray(gt_l[None]),
            cfg,
        )
        assert bool(out.ok[0])
        labels = np.asarray(out.labels[0])
        sel_rois = np.asarray(out.rois[0])
        assert labels.shape == (cfg.rcnn_batch_size,)
        # every selected roi labeled >0 must have IoU > 0.5 with its class' gt
        all_rois = np.concatenate([rois[0], gt_b[:2]])
        for r, l in zip(sel_rois, labels):
            iou = oracle.iou_matrix_oracle(r[None], gt)[0]
            if l > 0:
                assert iou.max() > 0.5
                assert l in (7, 9)
            else:
                assert iou.max() <= 0.5
        # fg count respects the cap
        assert (labels > 0).sum() <= max(
            int(cfg.rcnn_fg_prop * cfg.rcnn_batch_size),
            cfg.rcnn_batch_size - 32,  # fill rule lower bound
        )

    def test_gt_boxes_appended_as_fg(self, cfg):
        """With no overlapping rois at all, the appended GT boxes are the
        only foreground (IoU 1 with themselves)."""
        gt = np.array([[100, 100, 200, 180]], np.float32)
        gt_b, gt_v, gt_l = pad_gt(gt, [5], cfg.max_gt_boxes)
        rois = np.tile(np.array([[800, 300, 900, 370]], np.float32), (30, 1))[None]
        valid = np.ones((1, 30), bool)
        out = proposal_target_layer(
            jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(valid),
            jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]), jnp.asarray(gt_l[None]),
            cfg,
        )
        labels = np.asarray(out.labels[0])
        sel = np.asarray(out.rois[0])
        fg = labels == 5
        assert fg.sum() == 1  # the appended gt box itself
        np.testing.assert_allclose(sel[fg][0], gt[0], atol=1e-5)

    def test_impossible_fill_flag(self, cfg):
        """Fewer total rois than rcnn_batch_size -> ok=False
        (reference: layers.py:362-364)."""
        gt = np.array([[100, 100, 200, 180]], np.float32)
        gt_b, gt_v, gt_l = pad_gt(gt, [5], cfg.max_gt_boxes)
        rois = np.tile(np.array([[800, 300, 900, 370]], np.float32), (5, 1))[None]
        valid = np.zeros((1, 5), bool)  # no valid proposals at all
        out = proposal_target_layer(
            jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(valid),
            jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]), jnp.asarray(gt_l[None]),
            cfg,
        )
        assert not bool(out.ok[0])

    def test_expanded_regression_targets(self, cfg):
        gt = np.array([[100, 100, 200, 180]], np.float32)
        gt_b, gt_v, gt_l = pad_gt(gt, [7], cfg.max_gt_boxes)
        rois = (gt[0] + np.array([10, -8, 10, -8], np.float32))[None, None]
        rois = np.tile(rois, (1, 30, 1))
        valid = np.ones((1, 30), bool)
        out = proposal_target_layer(
            jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(valid),
            jnp.asarray(gt_b[None]), jnp.asarray(gt_v[None]), jnp.asarray(gt_l[None]),
            cfg,
        )
        tgts = np.asarray(out.bbox_targets[0])
        labels = np.asarray(out.labels[0])
        for i, l in enumerate(labels):
            row = tgts[i].reshape(-1, 4)
            if l > 0:
                assert np.abs(row[l]).sum() > 0
                zero_rows = np.delete(np.arange(row.shape[0]), l)
                assert np.abs(row[zero_rows]).sum() == 0
            else:
                assert np.abs(row).sum() == 0


class TestFixedNegObjective:
    """Opt-in stage-1 hard-negative objective (cfg.fixed_neg_objective):
    background CE over the rcnn_batch_size*20 most fg-confident anchors —
    the loss the reference INTENDS before its indexing collapse
    (PARITY.md deviation 10)."""

    def _probs(self, rng, b=2, n=900):
        x = rng.normal(0, 1, (b, n, 2)).astype(np.float32)
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def test_matches_numpy_topk_bg_ce(self, rng):
        from birdsoundclassif_tpu.train import losses as L

        cfg = NbmConfig()
        cfg.fixed_neg_objective = True
        probs = self._probs(rng)
        got = float(L.first_stage_neg_loss(jnp.asarray(probs), cfg)[
            "first_neg_class_loss"])
        k = cfg.rcnn_batch_size * 20
        want = 0.0
        for i in range(probs.shape[0]):
            top = np.argsort(-probs[i, :, 1])[:k]
            want += -np.log(np.clip(probs[i, top, 0], 1e-10, None)).mean()
        want /= probs.shape[0]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_minimized_at_background(self, rng):
        """Unlike the faithful loss (optimum at p=(0.5, 0.5)), the fixed
        objective strictly prefers confident background."""
        from birdsoundclassif_tpu.train import losses as L

        cfg = NbmConfig()
        cfg.fixed_neg_objective = True
        n = 900
        half = np.full((1, n, 2), 0.5, np.float32)
        bg = np.stack([np.full((1, n), 0.99, np.float32),
                       np.full((1, n), 0.01, np.float32)], axis=-1)
        l_half = float(L.first_stage_neg_loss(jnp.asarray(half), cfg)[
            "first_neg_class_loss"])
        l_bg = float(L.first_stage_neg_loss(jnp.asarray(bg), cfg)[
            "first_neg_class_loss"])
        assert l_bg < l_half

    def test_default_keeps_reference_semantics(self, rng):
        """fixed_neg_objective defaults off: the faithful top-1-collapse
        loss is returned bit-identically with the flag absent or False."""
        from birdsoundclassif_tpu.train import losses as L

        cfg = NbmConfig()
        assert cfg.fixed_neg_objective is False
        probs = self._probs(rng)
        got = L.first_stage_neg_loss(jnp.asarray(probs), cfg)
        top1 = probs[..., 1].argmax(axis=1)
        pair = np.stack([probs[i, t] for i, t in enumerate(top1)])
        want = -np.log(np.clip(pair, 1e-10, None)).mean()
        np.testing.assert_allclose(float(got["first_neg_class_loss"]),
                                   want, rtol=1e-5)
