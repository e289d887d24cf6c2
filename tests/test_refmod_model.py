"""Module-level parity against the GENUINE reference nn.Modules
(/root/reference/nbm_model/nets/{self_attention,fpn,layers}.py), driven via
tests/refbridge with weights exported through
torch_convert.params_to_state_dict (VERDICT r2 next-round #1).

Each test: init OUR params -> export to the reference's state_dict key
space -> load into the real reference module -> run both on identical
inputs -> assert numerically equal outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import refbridge as rb
from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.attention import sa_pyramid_init, sa_pyramid_apply
from birdsoundclassif_tpu.models.fpn import (
    bifpn_init,
    bifpn_apply,
    fpn_init,
    fpn_apply,
)
from birdsoundclassif_tpu.models.rpn import proposal_layer, rpn_apply, rpn_init
from birdsoundclassif_tpu.models.roi import roi_pool
from birdsoundclassif_tpu.models.rcnn import (
    fast_rcnn_inference,
    rcnn_apply,
    rcnn_init,
)
from birdsoundclassif_tpu.models.torch_convert import params_to_state_dict
from torch_oracles import randomize_bn_stats


def load_ref_module(module, state_dict, strip_prefix):
    """Load our exported state dict (numpy values) into a genuine reference
    module, stripping the full-model key prefix."""
    sd = {
        k[len(strip_prefix):]: torch.tensor(np.asarray(v))
        for k, v in state_dict.items()
        if k.startswith(strip_prefix)
    }
    missing, unexpected = module.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected: {unexpected}"
    assert all("num_batches_tracked" in k for k in missing), f"missing: {missing}"
    return module


def nchw(x):
    return torch.tensor(np.moveaxis(np.asarray(x, np.float32), -1, 1))


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------------------
# self-attention pyramid
# ---------------------------------------------------------------------------


def test_sa_pyramid_topn_matches_reference(rng):
    sa = rb.ref("nets.self_attention")
    channels = [8, 12, 16, 20, 24]
    cfg = NbmConfig()
    cfg.pyramid_top_n_attn = 2
    params = sa_pyramid_init(jax.random.PRNGKey(1), channels, 2)
    sd = params_to_state_dict({"attn": params}, cfg)
    ref_mod = load_ref_module(sa.SAPyramid(channels, 2), sd, "attn.").eval()

    feats = [
        jnp.asarray(rng.normal(size=(2, 16 // (2 ** i) + 3, 24 // (2 ** i) + 1, c))
                    .astype(np.float32))
        for i, c in enumerate(channels[:3])
    ] + [
        jnp.asarray(rng.normal(size=(2, 5, 7, channels[3])).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 3, 4, channels[4])).astype(np.float32)),
    ]
    with torch.no_grad():
        want = ref_mod([nchw(f) for f in feats])
    got = sa_pyramid_apply(params, feats, top_n=2)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-4, atol=1e-5)


def test_sa_pyramid_full_attention_matches_reference(rng):
    """top_n == n branch: per-level downscale 2**(3-i), frequency PE, and the
    reference's downscale-branch-returns-input bug (self_attention.py:52-54)."""
    sa = rb.ref("nets.self_attention")
    channels = [8, 12, 16, 20, 24]
    cfg = NbmConfig()
    cfg.pyramid_top_n_attn = 5
    params = sa_pyramid_init(jax.random.PRNGKey(2), channels, 5)
    sd = params_to_state_dict({"attn": params}, cfg)
    ref_mod = load_ref_module(sa.SAPyramid(channels, 5), sd, "attn.").eval()

    feats = [
        jnp.asarray(
            rng.normal(size=(1, 32 // (2 ** i), 64 // (2 ** i), c)).astype(np.float32)
        )
        for i, c in enumerate(channels)
    ]
    with torch.no_grad():
        want = ref_mod([nchw(f) for f in feats])
    got = sa_pyramid_apply(params, feats, top_n=5)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-4,
                                   atol=1e-5, err_msg=f"level {i}")


# ---------------------------------------------------------------------------
# FPN / BiFPN
# ---------------------------------------------------------------------------


def test_fpn_matches_reference(rng):
    fpn = rb.ref("nets.fpn")
    channels = [8, 12, 16, 20, 24]
    cfg = NbmConfig()
    params = fpn_init(jax.random.PRNGKey(3), channels, p_cn=10, out_cn=6)
    sd = params_to_state_dict({"fpn": params}, cfg)
    ref_mod = load_ref_module(fpn.FPN(channels, 10, 6), sd, "fpn.").eval()

    feats = [
        jnp.asarray(
            rng.normal(size=(2, 48 // (2 ** i), 128 // (2 ** i), c)).astype(np.float32)
        )
        for i, c in enumerate(channels)
    ]
    with torch.no_grad():
        want = ref_mod([nchw(f) for f in feats])
    got = fpn_apply(params, feats)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-4,
                                   atol=1e-5, err_msg=f"level {i}")


def test_bifpn_matches_reference(rng):
    """BiFPN through the (newly bifpn-aware) checkpoint-converter key map."""
    fpn = rb.ref("nets.fpn")
    channels = [4, 6, 8, 10, 12]  # pairwise distinct, like resnet's
    cfg = NbmConfig(fpn="bifpn", n_bifpn_layers=2)
    params = bifpn_init(jax.random.PRNGKey(4), 2, channels, out_cn=6)
    randomize_bn_stats(params, rng)
    sd = params_to_state_dict({"fpn": params}, cfg)
    ref_mod = load_ref_module(fpn.BiFPN(2, channels, 6), sd, "fpn.").eval()

    feats = [
        jnp.asarray(
            rng.normal(size=(2, 32 // (2 ** i), 64 // (2 ** i), c)).astype(np.float32)
        )
        for i, c in enumerate(channels)
    ]
    with torch.no_grad():
        want = ref_mod([nchw(f) for f in feats])
    got = bifpn_apply(params, feats)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-3,
                                   atol=1e-4, err_msg=f"level {i}")


# ---------------------------------------------------------------------------
# RPN + ProposalLayer
# ---------------------------------------------------------------------------


def small_cfg(**kw):
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.out_fpn_chan = 8
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_rpn_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = small_cfg()
    cfg.top_size = (6, 16)
    args = rb.make_ref_args(cfg, top_size=(6, 16))
    params = rpn_init(jax.random.PRNGKey(5), cfg)
    randomize_bn_stats(params, rng)
    sd = params_to_state_dict({"head": {"rpn": params}}, cfg)
    ref_mod = load_ref_module(
        layers.RegionProposalNetwork(args, cfg.n_layers, args.top_size),
        sd, "head.rpn.").eval()

    feats = [
        jnp.asarray(
            rng.normal(size=(2, 48 // (2 ** i), 128 // (2 ** i), cfg.out_fpn_chan))
            .astype(np.float32))
        for i in range(cfg.n_layers)
    ]
    with torch.no_grad():
        want_cls, want_reg = ref_mod([nchw(f) for f in feats])
    got_cls, got_reg = rpn_apply(params, feats, cfg)
    # ours: (B, h, w, L*A, 2) softmaxed; reference: (B, L*A*2, h, w)
    b, th, tw = 2, 6, 16
    la = cfg.n_layers * cfg.n_ratios
    got_cls_t = np.asarray(got_cls).reshape(b, th, tw, la * 2).transpose(0, 3, 1, 2)
    got_reg_t = np.asarray(got_reg).reshape(b, th, tw, la * 4).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_cls_t, want_cls.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_reg_t, want_reg.numpy(), rtol=1e-4, atol=1e-4)


def test_proposal_layer_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = small_cfg()
    cfg.top_size = (6, 16)
    args = rb.make_ref_args(cfg, top_size=(6, 16))
    ref_mod = layers.ProposalLayer(args, cfg.n_layers).eval()

    b, (th, tw) = 2, cfg.top_size
    la = cfg.n_layers * cfg.n_ratios
    logits = rng.normal(size=(b, th, tw, la, 2)).astype(np.float32)
    cls_scores = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    bbox_reg = jnp.asarray(rng.normal(0, 0.2, (b, th, tw, la, 4)).astype(np.float32))

    ref_cls = torch.tensor(
        np.asarray(cls_scores).reshape(b, th, tw, la * 2).transpose(0, 3, 1, 2))
    ref_reg = torch.tensor(
        np.asarray(bbox_reg).reshape(b, th, tw, la * 4).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want_boxes, want_scores = ref_mod(ref_cls, ref_reg)

    got = proposal_layer(cls_scores, bbox_reg, cfg, training=False)
    assert bool(got.rpn_ok)
    k = int(np.asarray(got.valid[0]).sum())
    assert k == want_boxes.shape[1]
    np.testing.assert_array_equal(np.asarray(got.rois)[:, :k], want_boxes.numpy())
    np.testing.assert_allclose(np.asarray(got.scores)[:, :k],
                               want_scores.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# RoI pooling
# ---------------------------------------------------------------------------


def test_roi_pooling_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = small_cfg()
    args = rb.make_ref_args(cfg)
    ref_mod = layers.ROIPooling(args).eval()

    b, r = 2, 12
    # plausible mix of box scales so several pyramid levels are exercised
    boxes = []
    for _ in range(b * r):
        w = rng.uniform(4, 600)
        h = rng.uniform(4, 300)
        x1 = rng.uniform(0, 1023 - w)
        y1 = rng.uniform(0, 374 - h)
        boxes.append([x1, y1, x1 + w, y1 + h])
    rois = np.round(np.array(boxes, np.float32)).reshape(b, r, 4)

    heights = [188, 94, 47, 24, 12]
    widths = [512, 256, 128, 64, 32]
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, cfg.out_fpn_chan)).astype(np.float32))
        for h, w in zip(heights, widths)
    ]
    with torch.no_grad():
        want_pool, want_pe, want_lvl = ref_mod(
            torch.tensor(rois), [nchw(f) for f in feats])

    got_pool, got_pe, got_lvl = roi_pool(jnp.asarray(rois), feats, cfg)
    np.testing.assert_array_equal(np.asarray(got_lvl), want_lvl)
    # ref: (B, R, C, ph, pw); ours: (B, R, ph, pw, C)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_pool), -1, 2), want_pool.numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_pe), -1, 2), want_pe.numpy(),
        rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# RCNN head + full FastRCNN inference cascade
# ---------------------------------------------------------------------------


def test_rcnn_head_matches_reference(rng):
    layers = rb.ref("nets.layers")
    cfg = small_cfg(num_classes=5, depth_rcnn=2)
    args = rb.make_ref_args(cfg)
    params = rcnn_init(jax.random.PRNGKey(6), cfg)
    randomize_bn_stats(params, rng)
    sd = params_to_state_dict({"head": {"rcnn": params}}, cfg)
    ref_mod = load_ref_module(layers.RCNN(args), sd, "head.fast_rcnn.rcnn.").eval()

    b, r, ph, pw, c = 2, 4, cfg.roi_pool_h, cfg.roi_pool_w, cfg.out_fpn_chan
    pooled = rng.normal(size=(b, r, c, ph, pw)).astype(np.float32)
    pe = rng.normal(size=(b, r, c, ph, pw)).astype(np.float32)
    with torch.no_grad():
        want_reg, want_cls = ref_mod(torch.tensor(pooled), torch.tensor(pe))

    pooled_j = jnp.asarray(np.moveaxis(pooled, 2, -1))
    pe_j = jnp.asarray(np.moveaxis(pe, 2, -1))
    got_reg, got_cls = rcnn_apply(params, pooled_j, pe_j)
    np.testing.assert_allclose(np.asarray(got_reg), want_reg.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("min_score,proposal_number", [(0.01, 50), (0.05, 2)])
def test_fast_rcnn_cascade_matches_reference(rng, min_score, proposal_number):
    """The whole second stage (ROIPooling -> RCNN -> inference NMS cascade)
    against the genuine FastRCNN.forward (layers.py:654-778)."""
    layers = rb.ref("nets.layers")
    cfg = small_cfg(num_classes=5, depth_rcnn=2, proposal_number=proposal_number)
    args = rb.make_ref_args(cfg, proposal_number=proposal_number)
    params = rcnn_init(jax.random.PRNGKey(7), cfg)
    randomize_bn_stats(params, rng)
    sd = params_to_state_dict({"head": {"rcnn": params}}, cfg)
    ref_mod = layers.FastRCNN(args)
    load_ref_module(ref_mod, sd, "head.fast_rcnn.").eval()

    b, r = 2, 16
    boxes = []
    for _ in range(b * r):
        w = rng.uniform(8, 500)
        h = rng.uniform(8, 250)
        x1 = rng.uniform(0, 1023 - w)
        y1 = rng.uniform(0, 374 - h)
        boxes.append([x1, y1, x1 + w, y1 + h])
    rois = np.round(np.array(boxes, np.float32)).reshape(b, r, 4)

    heights = [188, 94, 47, 24, 12]
    widths = [512, 256, 128, 64, 32]
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, cfg.out_fpn_chan)).astype(np.float32))
        for h, w in zip(heights, widths)
    ]
    with torch.no_grad():
        want = ref_mod([nchw(f) for f in feats], torch.tensor(rois),
                       nms_thresh=0.3, min_score=min_score, training=False)

    pooled, pe, _ = roi_pool(jnp.asarray(rois), feats, cfg)
    reg, cls = rcnn_apply(params, pooled, pe)
    det = fast_rcnn_inference(reg, cls, jnp.asarray(rois),
                              jnp.ones((b, r), bool), cfg,
                              nms_thresh=0.3, min_score=min_score)

    det_boxes = np.asarray(det.boxes)
    det_scores = np.asarray(det.scores)
    det_classes = np.asarray(det.classes)
    det_valid = np.asarray(det.valid)
    for b_idx in range(b):
        for class_idx in range(1, cfg.num_classes + 1):
            w_boxes = want[b_idx][str(class_idx)]["bbox_coord"]
            w_scores = np.asarray(want[b_idx][str(class_idx)]["scores"]).reshape(-1)
            sel = det_valid[b_idx] & (det_classes[b_idx] == class_idx)
            order = np.argsort(-det_scores[b_idx][sel], kind="stable")
            g_boxes = det_boxes[b_idx][sel][order]
            g_scores = det_scores[b_idx][sel][order]
            assert len(g_scores) == len(w_scores), (
                f"image {b_idx} class {class_idx}: {len(g_scores)} vs {len(w_scores)}")
            if len(w_scores):
                np.testing.assert_array_equal(
                    g_boxes, np.asarray(w_boxes).reshape(-1, 4))
                np.testing.assert_allclose(g_scores, w_scores,
                                           rtol=1e-4, atol=1e-6)
