"""Second-stage RCNN head parity vs a torch reconstruction (reference:
layers.py:500-586): pe_proj, FiLM-modulated depthwise blocks, and the
flatten->linear heads — including the (C,ph,pw) vs (ph,pw,C) flatten-layout
permute the checkpoint converter must apply."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.rcnn import rcnn_init, rcnn_apply
from birdsoundclassif_tpu.models.torch_convert import params_to_state_dict


class TorchRCNN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.out_fpn_chan
        hidden = c * cfg.roi_pool_h * cfg.roi_pool_w
        self.pe_proj = tnn.Conv2d(c, c, 1)
        self.blocks = tnn.ModuleList()
        for _ in range(cfg.depth_rcnn):
            blk = tnn.ModuleDict({
                "depth_wise": tnn.Conv2d(c, 4 * c, 3, padding=1, groups=c),
                "pe_proj": tnn.Conv2d(c, 8 * c, 1),
                "pt_wise": tnn.Conv2d(4 * c, c, 1),
                "norm": tnn.BatchNorm2d(c),
            })
            self.blocks.append(blk)
        self.bbox_reg_layer = tnn.Linear(hidden, 4 * (1 + cfg.num_classes))
        self.bbox_classif_layer = tnn.Linear(hidden, 1 + cfg.num_classes)

    def forward(self, pooled, pe):
        pe = self.pe_proj(pe)
        out = pooled
        for blk in self.blocks:
            dw = blk["depth_wise"](out)
            pem = blk["pe_proj"](F.silu(pe))
            half = pem.shape[1] // 2
            dw = dw * pem[:, :half] + pem[:, half:]
            dw = blk["pt_wise"](dw)
            blk["norm"].eval()
            out = F.silu(blk["norm"](dw))
        flat = out.flatten(start_dim=1)  # (N, C*ph*pw) — C-major
        return self.bbox_reg_layer(flat), torch.softmax(
            self.bbox_classif_layer(flat), dim=-1
        )


def test_rcnn_head_parity(rng):
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.out_fpn_chan = 8
    cfg.num_classes = 4
    cfg.depth_rcnn = 2
    params = {"head": {"rcnn": rcnn_init(jax.random.PRNGKey(0), cfg)}}
    sd = {k: torch.tensor(v) for k, v in params_to_state_dict(params, cfg).items()}

    model = TorchRCNN(cfg)
    mapped = {}
    for k, v in sd.items():
        if not k.startswith("head.fast_rcnn.rcnn."):
            continue
        kk = k[len("head.fast_rcnn.rcnn."):]
        kk = kk.replace("rcnn.", "blocks.", 1) if kk.startswith("rcnn.") else kk
        mapped[kk] = v
    missing, unexpected = model.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    b, r, ph, pw, c = 2, 3, cfg.roi_pool_h, cfg.roi_pool_w, cfg.out_fpn_chan
    pooled = rng.normal(size=(b * r, c, ph, pw)).astype(np.float32)
    pe = rng.normal(size=(b * r, c, ph, pw)).astype(np.float32)
    with torch.no_grad():
        want_reg, want_cls = model(torch.tensor(pooled), torch.tensor(pe))

    pooled_j = jnp.asarray(np.moveaxis(pooled, 1, -1)).reshape(b, r, ph, pw, c)
    pe_j = jnp.asarray(np.moveaxis(pe, 1, -1)).reshape(b, r, ph, pw, c)
    got_reg, got_cls = rcnn_apply(params["head"]["rcnn"], pooled_j, pe_j)
    np.testing.assert_allclose(np.asarray(got_reg), want_reg.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-3, atol=1e-5)
