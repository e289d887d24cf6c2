"""Composition parity for the full first stage: backbone -> SA pyramid ->
FPN -> RPN heads, JAX vs a torch reconstruction of the reference modules fed
OUR weights through the converter key map. Catches wiring-order bugs
(attention level placement, FPN conv indexing, channel layouts) that
block-level tests cannot."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.detector import NbmModel
from birdsoundclassif_tpu.models.backbone import backbone_apply
from birdsoundclassif_tpu.models.attention import sa_pyramid_apply
from birdsoundclassif_tpu.models.fpn import build_fpn_apply
from birdsoundclassif_tpu.models.rpn import rpn_apply
from birdsoundclassif_tpu.models.torch_convert import params_to_state_dict

from test_backbone_torch_parity import TorchResNet50Body


class TorchSelfAttention(tnn.Module):
    """reference: self_attention.py:10-56 (no downscale / PE branch)."""

    def __init__(self, input_dim, inner_dim):
        super().__init__()
        self.query = tnn.Linear(input_dim, inner_dim)
        self.key = tnn.Linear(input_dim, inner_dim)
        self.value = tnn.Linear(input_dim, inner_dim)
        self.final_projection = tnn.Linear(inner_dim, input_dim)

    def forward(self, inpt):
        bs, c, h, w = inpt.shape
        x = inpt.flatten(start_dim=-2).transpose(1, 2).contiguous().flatten(end_dim=-2)
        q = self.query(x).view(bs, h * w, -1)
        k = self.key(x).view(bs, h * w, -1)
        v = self.value(x).view(bs, h * w, -1)
        factors = torch.softmax(
            torch.matmul(q, k.transpose(1, 2)) / np.round(np.sqrt(q.size(-1)), 2), dim=-1
        )
        ctx = torch.matmul(factors, v)
        ctx = self.final_projection(ctx.flatten(end_dim=-2)).view(bs, h * w, c)
        return ctx.transpose(1, 2).contiguous().view(bs, c, h, w)


class TorchDSC(tnn.Module):
    """reference DepthwiseSepConv2d (layers.py:13-46), eval-mode BN."""

    def __init__(self, indim, outdim, stride=1, expansion=2):
        super().__init__()
        self.stride = stride
        self.depth_wise = tnn.Conv2d(indim, expansion * indim, 3,
                                     stride=int(max(1, stride)), padding=1,
                                     groups=indim)
        self.pt_wise = tnn.Conv2d(expansion * indim, outdim, 1)
        self.norm = tnn.BatchNorm2d(outdim)
        self.act = tnn.SiLU()

    def forward(self, x):
        if self.stride < 1:
            size = ((1 / self.stride) * np.array(x.shape[-2:])).astype(np.int64).tolist()
            x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        out = self.depth_wise(x)
        out = self.pt_wise(out)
        self.norm.eval()
        out = self.norm(out)
        return self.act(out)


@pytest.fixture(scope="module")
def small_cfg():
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.num_classes = 5
    cfg.depth_rcnn = 1
    return cfg


def test_stage1_composition_parity(rng, small_cfg):
    cfg = small_cfg
    key = jax.random.PRNGKey(1)
    params = NbmModel.init(key, cfg)
    sd = {k: torch.tensor(v) for k, v in params_to_state_dict(params, cfg).items()}

    # ---- torch reconstruction ----
    body = TorchResNet50Body()
    body.load_state_dict(
        {k[len("backbone.0.body."):]: v for k, v in sd.items()
         if k.startswith("backbone.0.body.")}
    )
    init_conv = tnn.Conv2d(1, 3, 1)
    init_conv.weight.data = sd["backbone.0.init_conv.weight"]
    init_conv.bias.data = sd["backbone.0.init_conv.bias"]

    channels = [64, 256, 512, 1024, 2048]
    attns = {}
    for i in (3, 4):  # top-2 levels with default pyramid_top_n_attn=2
        a = TorchSelfAttention(channels[i], channels[i] // 2)
        a.load_state_dict(
            {k[len(f"attn.attention_modules.{i}."):]: v for k, v in sd.items()
             if k.startswith(f"attn.attention_modules.{i}.")}
        )
        attns[i] = a

    pt_wise = {}
    out_convs = {}
    for i in range(5):
        c1 = tnn.Conv2d(channels[i], cfg.fpn_p_chan, 1)
        c1.weight.data = sd[f"fpn.pt_wise.{i}.weight"]
        c1.bias.data = sd[f"fpn.pt_wise.{i}.bias"]
        pt_wise[i] = c1
        c2 = tnn.Conv2d(cfg.fpn_p_chan, cfg.out_fpn_chan, 3, padding=1)
        c2.weight.data = sd[f"fpn.out_convs.{i}.weight"]
        c2.bias.data = sd[f"fpn.out_convs.{i}.bias"]
        out_convs[i] = c2

    rpn_convs, cls_heads, reg_heads = {}, {}, {}
    for i in range(5):
        dsc = TorchDSC(cfg.out_fpn_chan, cfg.out_fpn_chan,
                       stride=cfg.anchor_stride / (2 ** (i + 1)), expansion=2)
        dsc.load_state_dict(
            {k[len(f"head.rpn.convs.{i}."):]: v for k, v in sd.items()
             if k.startswith(f"head.rpn.convs.{i}.")},
            strict=False,  # num_batches_tracked absent by design
        )
        rpn_convs[i] = dsc
        ch = tnn.Conv2d(cfg.out_fpn_chan, cfg.n_ratios * 2, 1)
        ch.weight.data = sd[f"head.rpn.cls_score.{i}.weight"]
        ch.bias.data = sd[f"head.rpn.cls_score.{i}.bias"]
        cls_heads[i] = ch
        rh = tnn.Conv2d(cfg.out_fpn_chan, cfg.n_ratios * 4, 1)
        rh.weight.data = sd[f"head.rpn.bbox_reg.{i}.weight"]
        rh.bias.data = sd[f"head.rpn.bbox_reg.{i}.bias"]
        reg_heads[i] = rh

    x = rng.normal(size=(1, 1, 192, 256)).astype(np.float32)

    with torch.no_grad():
        feats = body(init_conv(torch.tensor(x)))
        # SAPyramid: fm + module(fm); identity levels -> 2*fm
        feats = [
            f + (attns[i](f) if i in attns else f) for i, f in enumerate(feats)
        ]
        # FPN (reference: fpn.py:132-146)
        p_outs = [pt_wise[i](f) for i, f in enumerate(feats)]
        out = p_outs.pop(-1)
        outs = [out_convs[0](out)]
        i = 0
        while p_outs:
            i += 1
            p = p_outs.pop(-1)
            up = F.interpolate(out, size=p.shape[-2:], mode="bilinear",
                               align_corners=True)
            out = up + p
            outs.insert(0, out_convs[i](out))
        # RPN (reference: layers.py:79-99)
        th, tw = cfg.top_size
        conv_out = [
            F.adaptive_avg_pool2d(rpn_convs[i](f), (th, tw))
            for i, f in enumerate(outs)
        ]
        bs = 1
        cls = [cls_heads[i](f).view(bs, cfg.n_ratios, 2, th, tw).softmax(2)
               for i, f in enumerate(conv_out)]
        want_cls = torch.cat(cls, dim=1).numpy()          # (1, 15, 2, th, tw)
        reg = [reg_heads[i](f).view(bs, cfg.n_ratios, 4, th, tw)
               for i, f in enumerate(conv_out)]
        want_reg = torch.cat(reg, dim=1).numpy()

    # ---- our stage 1 (same sub-steps, NHWC) ----
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    feats_j, _ = backbone_apply(params["backbone"], xj, cfg)
    feats_j = sa_pyramid_apply(params["attn"], feats_j, cfg.pyramid_top_n_attn)
    fpn_j = build_fpn_apply(params["fpn"], cfg, feats_j)
    cls_j, reg_j = rpn_apply(params["head"]["rpn"], fpn_j, cfg)
    # ours: (B, th, tw, LA, 2) -> torch (B, LA, 2, th, tw)
    got_cls = np.transpose(np.asarray(cls_j), (0, 3, 4, 1, 2))
    got_reg = np.transpose(np.asarray(reg_j), (0, 3, 4, 1, 2))
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got_reg, want_reg, rtol=1e-3, atol=2e-3)
