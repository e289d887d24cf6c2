"""Target-assignment and criterion parity against the GENUINE reference
(nets/layers.py AnchorTargetLayer/ProposalTargetLayer, nets/nbm_model.py
SetCriterion) via tests/refbridge.

The target layers subsample with np.random.choice; tests patch it with a
deterministic take-first-k that also RECORDS each candidate pool, so the
assertions can separate the deterministic parts (label assignment, pools,
counts, regression targets) from the RNG-dependent choice itself:
our rank-of-uniform picks must come from exactly the reference's pools.
"""

from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import torch

import refbridge as rb
from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.train.targets import (
    AnchorTargetLayer,
    AnchorTargets,
    ProposalTargets,
    proposal_target_layer,
)
from birdsoundclassif_tpu.train import losses as L


class ChoiceRecorder:
    """np.random.choice stand-in: deterministic first-k, records pools."""

    def __init__(self):
        self.calls = []

    def __call__(self, a, size=None, replace=True):
        a = np.asarray(a)
        self.calls.append(a.copy())
        return a[:size]


def make_gt(rng, n, w=1024, h=375, min_side=24, max_w=400, max_h=200):
    boxes = []
    for _ in range(n):
        bw = rng.uniform(min_side, max_w)
        bh = rng.uniform(min_side, max_h)
        x1 = rng.uniform(0, w - 1 - bw)
        y1 = rng.uniform(0, h - 1 - bh)
        boxes.append([x1, y1, x1 + bw, y1 + bh])
    return np.round(np.array(boxes, np.float32))


# ---------------------------------------------------------------------------
# AnchorTargetLayer
# ---------------------------------------------------------------------------


def test_anchor_target_layer_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = NbmConfig()
    args = rb.make_ref_args(cfg)
    ref_atl = layers.AnchorTargetLayer(args)

    lengths = [2, 1]
    # aspect ratios / sizes chosen between the anchor grid points so that
    # no anchor reaches IoU 0.7 easily and the fg set (mostly per-GT argmax
    # forcing) stays below num_fg=8 -> no RNG fg subsample to untangle
    gt = np.array(
        [
            [103.0, 57.0, 103 + 91, 57 + 37],
            [411.0, 210.0, 411 + 41, 210 + 149],
            [650.0, 90.0, 650 + 201, 90 + 83],
        ],
        np.float32,
    )
    rec = ChoiceRecorder()
    with mock.patch("numpy.random.choice", rec):
        ref_labels, ref_reg = ref_atl(torch.tensor(gt), lengths)

    b = len(lengths)
    th, tw = cfg.top_size
    a = cfg.n_ratios * cfg.n_layers
    k_all = th * tw * a
    # undo the (B, A, H, W) permute back to the flat (y, x, a) anchor order
    ref_labels = ref_labels.permute(0, 2, 3, 1).reshape(b, k_all).numpy()
    ref_reg = ref_reg.permute(0, 2, 3, 1).reshape(b, k_all, 4).numpy()

    g = max(lengths)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_boxes[0, :2] = gt[:2]
    gt_valid[0, :2] = True
    gt_boxes[1, :1] = gt[2:]
    gt_valid[1, :1] = True

    atl = AnchorTargetLayer(cfg)
    out = atl(jax.random.PRNGKey(0), jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    our_labels = np.asarray(out.labels)
    our_reg = np.asarray(out.reg_targets)

    inside = np.asarray(atl.inside_idx)
    num_fg = int(cfg.rpn_fg_fraction * cfg.rpn_batchsize)

    # with few GTs the fg count stays under num_fg: only the bg pool is
    # subsampled, exactly one choice call per image
    assert len(rec.calls) == b, [len(c) for c in rec.calls]
    for i in range(b):
        ref_fg = np.flatnonzero(ref_labels[i] == 1)
        our_fg = np.flatnonzero(our_labels[i] == 1)
        assert 0 < len(ref_fg) <= num_fg
        np.testing.assert_array_equal(our_fg, ref_fg)

        # regression targets are deterministic on fg anchors
        np.testing.assert_allclose(our_reg[i][ref_fg], ref_reg[i][ref_fg],
                                   rtol=1e-4, atol=1e-5)
        # non-positives carry no regression target in either implementation
        assert np.all(our_reg[i][our_labels[i] != 1] == 0)
        assert np.all(ref_reg[i][ref_labels[i] != 1] == 0)

        # bg: same count, and our picks must come from the reference's pool
        bg_pool = set(inside[rec.calls[i]].tolist()) | set(
            np.flatnonzero(ref_labels[i] == 0).tolist())
        ref_bg = np.flatnonzero(ref_labels[i] == 0)
        our_bg = np.flatnonzero(our_labels[i] == 0)
        assert len(our_bg) == len(ref_bg) == cfg.rpn_batchsize - len(ref_fg)
        assert set(our_bg.tolist()) <= bg_pool

        # everything else is ignored (-1) in both
        rest = np.setdiff1d(np.arange(k_all), np.concatenate([our_fg, our_bg]))
        assert np.all(our_labels[i][rest] == -1)


# ---------------------------------------------------------------------------
# ProposalTargetLayer
# ---------------------------------------------------------------------------


def test_proposal_target_layer_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = NbmConfig()
    cfg.num_classes = 6
    args = rb.make_ref_args(cfg, num_classes=6)
    ref_ptl = layers.ProposalTargetLayer(args)

    b, n, g = 2, 24, 2
    rois = np.stack([make_gt(rng, n, min_side=8) for _ in range(b)])
    gt = np.stack([make_gt(rng, g) for _ in range(b)])
    bird_ids = rng.integers(1, cfg.num_classes + 1, (b, g))
    lengths = [g, g]

    rec = ChoiceRecorder()
    with mock.patch("numpy.random.choice", rec):
        ref_rois, ref_tgts, ref_labels = ref_ptl(
            torch.tensor(rois),
            torch.tensor(np.concatenate(gt, axis=0)),
            torch.tensor(np.concatenate(bird_ids, axis=0)),
            lengths,
        )
    ref_rois = ref_rois.numpy()
    ref_tgts = ref_tgts.numpy()
    ref_labels = ref_labels.numpy()

    out = proposal_target_layer(
        jax.random.PRNGKey(1),
        jnp.asarray(rois),
        jnp.ones((b, n), bool),
        jnp.asarray(gt),
        jnp.ones((b, g), bool),
        jnp.asarray(bird_ids.astype(np.int32)),
        cfg,
    )
    assert bool(np.all(np.asarray(out.ok)))
    our_rois = np.asarray(out.rois)
    our_tgts = np.asarray(out.bbox_targets)
    our_labels = np.asarray(out.labels)
    s = cfg.rcnn_batch_size
    assert our_rois.shape == ref_rois.shape == (b, s, 4)

    call_ptr = 0
    for i in range(b):
        all_rois = np.concatenate([rois[i], gt[i]], axis=0)

        # choice pools for this image, in call order: fg, bg(, other-fill)
        fg_pool = rec.calls[call_ptr]
        bg_pool = rec.calls[call_ptr + 1]
        call_ptr += 2
        fg_take = min(len(fg_pool), int(cfg.rcnn_fg_prop * s))
        bg_take = min(len(bg_pool), s - fg_take)
        if fg_take + bg_take < s:  # other-fill call fired
            call_ptr += 1

        def rows_to_keys(r):
            return [tuple(np.round(row, 3)) for row in r]

        # fg: both keep the whole pool (fg count < rcnn_fg_prop * S)
        assert len(fg_pool) <= int(cfg.rcnn_fg_prop * s), len(fg_pool)
        ref_fg_rows = rows_to_keys(ref_rois[i][ref_labels[i] > 0])
        our_fg_rows = rows_to_keys(our_rois[i][our_labels[i] > 0])
        pool_rows = rows_to_keys(all_rois[fg_pool])
        assert sorted(ref_fg_rows) == sorted(pool_rows)
        assert sorted(our_fg_rows) == sorted(pool_rows)

        # fg labels + targets agree per roi (match rows by coordinates)
        ref_map = {
            tuple(np.round(r, 3)): (int(l), t)
            for r, l, t in zip(ref_rois[i], ref_labels[i], ref_tgts[i])
            if l > 0
        }
        for r, l, t in zip(our_rois[i], our_labels[i], our_tgts[i]):
            if l <= 0:
                continue
            want_l, want_t = ref_map[tuple(np.round(r, 3))]
            assert int(l) == want_l
            np.testing.assert_allclose(t, want_t, rtol=1e-4, atol=1e-5)

        # bg: same count; our bg rois drawn from the reference's bg pool
        # (plus the "other" pool when bg alone can't fill the batch)
        ref_bg = (ref_labels[i] == 0).sum()
        our_bg = (our_labels[i] == 0).sum()
        assert ref_bg == our_bg == s - len(pool_rows)
        bg_rows = set(rows_to_keys(all_rois)) - set(pool_rows)
        assert set(rows_to_keys(our_rois[i][our_labels[i] == 0])) <= bg_rows


# ---------------------------------------------------------------------------
# SetCriterion losses
# ---------------------------------------------------------------------------


def _criterion(cfg, **overrides):
    nbm = rb.ref("nets.nbm_model")
    args = rb.make_ref_args(cfg, **overrides)
    return nbm.SetCriterion(args, {})


def _softmax_np(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_first_stage_loss_matches_reference(rng):
    """Positive branch, with the reference's AnchorTargetLayer stubbed so
    both sides consume identical targets (the layer itself is covered by
    test_anchor_target_layer_matches_reference)."""
    cfg = NbmConfig()
    cfg.top_size = (6, 16)
    crit = _criterion(cfg, top_size=(6, 16))

    b, (th, tw), a = 2, cfg.top_size, cfg.n_ratios * cfg.n_layers
    k = th * tw * a
    probs = _softmax_np(rng, (b, k, 2))
    reg = rng.normal(0, 0.5, (b, k, 4)).astype(np.float32)
    labels = rng.choice([-1, 0, 1], size=(b, k), p=[0.8, 0.15, 0.05])
    labels[:, 0] = 1  # at least one positive
    reg_targets = rng.normal(0, 0.5, (b, k, 4)).astype(np.float32)
    reg_targets *= (labels == 1)[..., None]

    ref_labels = torch.tensor(labels.reshape(b, th, tw, a)).permute(0, 3, 1, 2)
    ref_regt = torch.tensor(reg_targets.reshape(b, th, tw, a * 4)).permute(0, 3, 1, 2)
    class _StubATL(torch.nn.Module):
        def forward(self, gt, lengths):
            return ref_labels, ref_regt

    crit.anchor_target_layer = _StubATL()

    ref_cls = torch.tensor(probs.reshape(b, th, tw, a * 2)).permute(0, 3, 1, 2)
    ref_reg = torch.tensor(reg.reshape(b, th, tw, a * 4)).permute(0, 3, 1, 2)
    want = crit.first_stage_loss(ref_cls, ref_reg,
                                 gt_bbox=torch.zeros(1, 4), lengths=[1, 0])

    got = L.first_stage_loss(
        jnp.asarray(probs.reshape(b, th, tw, a, 2)),
        jnp.asarray(reg.reshape(b, th, tw, a, 4)),
        AnchorTargets(labels=jnp.asarray(labels),
                      reg_targets=jnp.asarray(reg_targets)),
    )
    np.testing.assert_allclose(float(got["first_class_loss"]),
                               float(want["first_class_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(got["first_regression_loss"]),
                               float(want["first_regression_loss"]), rtol=1e-4)


def test_first_stage_neg_loss_matches_reference(rng):
    """The reference's hard-negative stage-1 loss collapses to the top-1
    prediction via a broadcasting accident (nbm_model.py:113-123 with
    nets_utils.py:262-272) — PARITY.md deviation 9, reproduced exactly."""
    cfg = NbmConfig()
    cfg.top_size = (6, 16)
    crit = _criterion(cfg, top_size=(6, 16))

    b, (th, tw), a = 2, cfg.top_size, cfg.n_ratios * cfg.n_layers
    probs = _softmax_np(rng, (b, th * tw * a, 2))
    ref_cls = torch.tensor(probs.reshape(b, th, tw, a * 2)).permute(0, 3, 1, 2)
    want = crit.first_stage_loss(ref_cls, None, neg_sample=True)

    got = L.first_stage_neg_loss(
        jnp.asarray(probs.reshape(b, th, tw, a, 2)), cfg)
    np.testing.assert_allclose(float(got["first_neg_class_loss"]),
                               float(want["first_neg_class_loss"]), rtol=1e-5)


def test_second_stage_loss_matches_reference(rng):
    nu = rb.ref("nets.util.nets_utils")
    for focal in (False, True):
        cfg = NbmConfig()
        cfg.num_classes = 6
        cfg.focal_loss = focal
        crit = _criterion(cfg, num_classes=6, focal_loss=focal)

        b, s, c = 2, cfg.rcnn_batch_size, cfg.num_classes
        n = b * s
        probs = _softmax_np(rng, (n, c + 1))
        reg = rng.normal(0, 0.5, (n, 4 * (c + 1))).astype(np.float32)
        labels = rng.integers(0, c + 1, (b, s))
        labels[:, 0] = 1 + labels[:, 0] % c  # at least one positive per image
        raw_tgt = rng.normal(0, 0.5, (n, 4)).astype(np.float32)
        tgts = nu.get_bbox_regression_targets(
            torch.tensor(raw_tgt), torch.tensor(labels.reshape(-1)), c
        ).numpy().reshape(b, s, -1)

        want = crit.second_stage_loss(
            torch.tensor(reg), torch.tensor(probs),
            bbox_targets=torch.tensor(tgts),
            labels=torch.tensor(labels))

        got = L.second_stage_loss(
            jnp.asarray(reg), jnp.asarray(probs),
            ProposalTargets(
                rois=jnp.zeros((b, s, 4)),
                bbox_targets=jnp.asarray(tgts),
                labels=jnp.asarray(labels.astype(np.int32)),
                ok=jnp.ones((b,), bool),
            ),
            cfg,
        )
        np.testing.assert_allclose(float(got["sec_class_loss"]),
                                   float(want["sec_class_loss"]),
                                   rtol=1e-5, err_msg=f"focal={focal}")
        np.testing.assert_allclose(float(got["sec_regression_loss"]),
                                   float(want["sec_regression_loss"]),
                                   rtol=1e-4, err_msg=f"focal={focal}")


def test_second_stage_neg_loss_matches_reference(rng):
    cfg = NbmConfig()
    cfg.num_classes = 6
    crit = _criterion(cfg, num_classes=6)
    probs = _softmax_np(rng, (24, cfg.num_classes + 1))
    want = crit.second_stage_loss(None, torch.tensor(probs), neg_sample=True)
    got = L.second_stage_neg_loss(jnp.asarray(probs))
    np.testing.assert_allclose(float(got["sec_neg_class_loss"]),
                               float(want["sec_neg_class_loss"]), rtol=1e-5)


def test_cardinality_matches_reference(rng):
    cfg = NbmConfig()
    cfg.num_classes = 6
    crit = _criterion(cfg, num_classes=6)
    probs = _softmax_np(rng, (24, cfg.num_classes + 1))
    labels = rng.integers(0, cfg.num_classes + 1, 24)
    want = crit.loss_cardinality(torch.tensor(probs), torch.tensor(labels))
    got = L.cardinality_error(jnp.asarray(probs), jnp.asarray(labels))
    assert float(got) == float(want["cardinality_error"])
