"""Parity of the fixed-shape proposal layer and FastRCNN inference cascade
vs direct oracles of the reference flow (reference: layers.py:219-303 and
:654-778)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.rpn import proposal_layer
from birdsoundclassif_tpu.models.rcnn import fast_rcnn_inference
from birdsoundclassif_tpu.ops.anchors import full_anchor_grid

import torch_oracles as oracle


def decode_np(deltas, anchors):
    return oracle.decode_oracle(deltas, anchors)


def proposal_oracle(cls_scores, bbox_reg, cfg, training=False):
    """reference ProposalLayer.forward in numpy. cls_scores: (B,h,w,LA,2)."""
    b, th, tw, la, _ = cls_scores.shape
    n = th * tw * la
    scores = cls_scores[..., 1].reshape(b, n)
    deltas = bbox_reg.reshape(b, n, 4)
    anchors = full_anchor_grid(
        cfg.base_size, tuple(cfg.ratios), tuple(cfg.scales), tw, th, cfg.anchor_stride
    )
    pre_top = cfg.pre_nms_topN if training else cfg.pre_nms_topN_eval
    post_top = cfg.post_nms_topN if training else cfg.post_nms_topN_eval

    all_boxes, all_scores = [], []
    keeps = []
    for i in range(b):
        boxes = decode_np(deltas[i], anchors)
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, cfg.img_width - 1)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, cfg.img_height - 1)
        keep = (
            (boxes[:, 2] - boxes[:, 0] + 1 >= cfg.min_threshold)
            & (boxes[:, 3] - boxes[:, 1] + 1 >= cfg.min_threshold)
        )
        keeps.append(keep)
        all_boxes.append(boxes)
        all_scores.append(scores[i])
    pre_eff = min(pre_top, min(int(k.sum()) for k in keeps))
    if pre_eff < cfg.rcnn_batch_size:
        return None  # RPN failure
    sel_boxes, sel_scores = [], []
    for i in range(b):
        order = np.argsort(-all_scores[i], kind="stable")
        order = order[keeps[i][order]][:pre_eff]
        sel_boxes.append(all_boxes[i][order])
        sel_scores.append(all_scores[i][order])
    # greedy NMS per image + batch-min truncation
    kept_lists = [
        oracle.greedy_nms_oracle(sel_boxes[i], sel_scores[i], cfg.nms_thresh)
        for i in range(b)
    ]
    k_eff = min(min(len(k) for k in kept_lists), post_top)
    out_boxes = np.stack([sel_boxes[i][kept_lists[i][:k_eff]] for i in range(b)])
    out_scores = np.stack([sel_scores[i][kept_lists[i][:k_eff]] for i in range(b)])
    return out_boxes, out_scores


class TestProposalLayer:
    def test_vs_oracle(self, rng):
        cfg = NbmConfig()
        b, (th, tw), la = 2, cfg.top_size, cfg.n_ratios * cfg.n_layers
        logits = rng.normal(size=(b, th, tw, la, 2)).astype(np.float32)
        e = np.exp(logits)
        cls = (e / e.sum(-1, keepdims=True)).astype(np.float32)
        reg = (rng.normal(size=(b, th, tw, la, 4)) * 0.4).astype(np.float32)

        props = proposal_layer(jnp.asarray(cls), jnp.asarray(reg), cfg, training=False)
        want = proposal_oracle(cls, reg, cfg, training=False)
        assert want is not None
        want_boxes, want_scores = want
        k_eff = want_boxes.shape[1]
        valid = np.asarray(props.valid)
        assert valid.sum(1).tolist() == [k_eff] * b
        got_boxes = np.asarray(props.rois)[:, :k_eff]
        got_scores = np.asarray(props.scores)[:, :k_eff]
        np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-3)
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)

    def test_rpn_failure_flag(self, rng):
        cfg = NbmConfig()
        b, (th, tw), la = 1, cfg.top_size, cfg.n_ratios * cfg.n_layers
        cls = np.full((b, th, tw, la, 2), 0.5, np.float32)
        # huge negative regressions -> all boxes degenerate (< min_threshold)
        reg = np.zeros((b, th, tw, la, 4), np.float32)
        reg[..., 2:] = -8.0  # log-space shrink
        props = proposal_layer(jnp.asarray(cls), jnp.asarray(reg), cfg, training=False)
        assert not bool(props.rpn_ok)


def cascade_oracle(bbox_reg, bbox_classes, rois, cfg, nms_thresh, min_score):
    """reference FastRCNN inference loop (layers.py:687-777) in numpy.
    Returns per image: dict class -> (boxes, scores)."""
    b, r = rois.shape[:2]
    num_classes = cfg.num_classes
    scores = bbox_classes.max(1).reshape(b, r)
    pred = bbox_classes.argmax(1).reshape(b, r)
    reg = np.stack(
        [bbox_reg.reshape(-1, num_classes + 1, 4)[i, c] for i, c in enumerate(pred.ravel())]
    ).reshape(b, r, 4)
    outputs = []
    for bi in range(b):
        boxes = decode_np(reg[bi], rois[bi])
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, cfg.img_width - 1)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, cfg.img_height - 1)
        order = np.argsort(-scores[bi], kind="stable")
        sb, ss, sc = boxes[order], scores[bi][order], pred[bi][order]
        nz = sc > 0
        out = {}
        if nz.any():
            sb, ss, sc = sb[nz], ss[nz], sc[nz]
            keep = oracle.greedy_nms_oracle(sb, ss, nms_thresh)
            sb, ss, sc = sb[keep], ss[keep], sc[keep]
            for c in range(1, num_classes + 1):
                cw = sc == c
                if not cw.any():
                    continue
                cb, cs = sb[cw], ss[cw]
                keep_c = oracle.greedy_nms_oracle(cb, cs, nms_thresh)[:cfg.proposal_number]
                cb, cs = cb[keep_c], cs[keep_c]
                m = cs > min_score
                if m.any():
                    out[c] = (cb[m], cs[m])
        outputs.append(out)
    return outputs


class TestCascade:
    def test_vs_oracle(self, rng):
        cfg = NbmConfig()
        cfg.num_classes = 12  # smaller class space for the oracle loop
        b, r = 2, 50
        rois = np.round(
            np.stack(
                [
                    rng.uniform(0, 900, (b, r)),
                    rng.uniform(0, 300, (b, r)),
                    np.zeros((b, r)),
                    np.zeros((b, r)),
                ],
                axis=-1,
            )
        ).astype(np.float32)
        rois[..., 2] = np.minimum(rois[..., 0] + np.round(rng.uniform(5, 200, (b, r))), 1023)
        rois[..., 3] = np.minimum(rois[..., 1] + np.round(rng.uniform(5, 100, (b, r))), 374)

        logits = rng.normal(size=(b * r, cfg.num_classes + 1)).astype(np.float32) * 2
        e = np.exp(logits)
        probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
        reg = (rng.normal(size=(b * r, 4 * (cfg.num_classes + 1))) * 0.3).astype(np.float32)

        det = fast_rcnn_inference(
            jnp.asarray(reg), jnp.asarray(probs), jnp.asarray(rois),
            jnp.ones((b, r), bool), cfg, nms_thresh=0.3, min_score=0.05,
        )
        want = cascade_oracle(reg, probs, rois, cfg, 0.3, 0.05)
        for bi in range(b):
            got = {}
            v = np.asarray(det.valid[bi])
            for j in np.nonzero(v)[0]:
                c = int(det.classes[bi, j])
                got.setdefault(c, []).append(
                    (np.asarray(det.boxes[bi, j]), float(det.scores[bi, j]))
                )
            assert set(got.keys()) == set(want[bi].keys())
            for c, pairs in got.items():
                wb, ws = want[bi][c]
                got_sorted = sorted(pairs, key=lambda p: -p[1])
                gb = np.stack([p[0] for p in got_sorted])
                gs = np.array([p[1] for p in got_sorted])
                np.testing.assert_allclose(gb, wb, atol=1e-3)
                np.testing.assert_allclose(gs, ws, rtol=1e-5)
