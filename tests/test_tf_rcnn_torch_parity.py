"""Transformer-RCNN head parity vs a torch reconstruction (reference:
layers.py:589-651 + the DETR-style encoder of self_attention.py:89-140),
through the checkpoint converter's tf_rcnn key map (packed MHA in_proj
split, embedding-linear flatten permute).

Documented deviation exercised here: in the reference's non-pe_qk branch the
torch default encoder is built with batch_first=False and a hardcoded
d_model=512 (layers.py:618-620), so it attends across the *batch* axis; we
attend over RoI tokens at tf_model_dim in both modes (see docs/PARITY.md).
The torch oracle below therefore uses batch_first=True at tf_model_dim."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.tf_rcnn import tf_rcnn_init, tf_rcnn_apply
from birdsoundclassif_tpu.models.torch_convert import (
    params_to_state_dict,
    state_dict_to_params,
)


def _small_cfg(pe_qk: bool) -> NbmConfig:
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.tf_rcnn = True
    cfg.tf_pe_qk = pe_qk
    cfg.out_fpn_chan = 8
    cfg.num_classes = 4
    cfg.tf_model_dim = 16
    cfg.tf_nhead = 4
    cfg.tf_num_encoder_layers = 2
    cfg.tf_dim_feedforward = 32
    return cfg


class CustomEncoderLayer(tnn.Module):
    """reference TransformerEncoderLayer (self_attention.py:100-140):
    post-norm, LeakyReLU FF, PE added to q/k only."""

    def __init__(self, d, nhead, ff):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, nhead, batch_first=True)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, src, pos):
        q = k = src + pos
        src2 = self.self_attn(q, k, value=src)[0]
        src = self.norm1(src + src2)
        src2 = self.linear2(F.leaky_relu(self.linear1(src)))
        return self.norm2(src + src2)


class TorchTfRCNN(tnn.Module):
    """reference Transformer_RCNN (layers.py:589-651), with the documented
    batch_first/d_model fix applied to the non-pe_qk branch."""

    def __init__(self, cfg):
        super().__init__()
        in_dim = cfg.out_fpn_chan * cfg.roi_pool_h * cfg.roi_pool_w
        d = cfg.tf_model_dim
        self.pos_embedding = tnn.Sequential(tnn.Linear(in_dim, d), tnn.LeakyReLU())
        self.rois_embedding = tnn.Sequential(tnn.Linear(in_dim, d), tnn.LeakyReLU())
        if cfg.tf_pe_qk:
            self.layers = tnn.ModuleList(
                CustomEncoderLayer(d, cfg.tf_nhead, cfg.tf_dim_feedforward)
                for _ in range(cfg.tf_num_encoder_layers)
            )
        else:
            self.encoder = tnn.TransformerEncoder(
                tnn.TransformerEncoderLayer(
                    d_model=d,
                    nhead=cfg.tf_nhead,
                    dim_feedforward=cfg.tf_dim_feedforward,
                    dropout=0.0,
                    batch_first=True,
                ),
                num_layers=cfg.tf_num_encoder_layers,
            )
        self.bbox_reg_layer = tnn.Linear(d, 4 * (1 + cfg.num_classes))
        self.bbox_classif_layer = tnn.Linear(d, 1 + cfg.num_classes)
        self.pe_qk = cfg.tf_pe_qk

    def forward(self, rois, pos):
        pos_embed = self.pos_embedding(pos.flatten(start_dim=-3))
        out = self.rois_embedding(rois.flatten(start_dim=-3))
        if self.pe_qk:
            for layer in self.layers:
                out = layer(out, pos_embed)
        else:
            self.encoder.eval()
            out = self.encoder(out + pos_embed)
        reg = self.bbox_reg_layer(out).flatten(end_dim=1)
        cls = torch.softmax(self.bbox_classif_layer(out), dim=-1).flatten(end_dim=1)
        return reg, cls


def _load_torch(model: TorchTfRCNN, params, cfg, pe_qk: bool):
    sd = {k: torch.tensor(v) for k, v in params_to_state_dict(params, cfg).items()}
    mapped = {}
    for k, v in sd.items():
        if not k.startswith("head.fast_rcnn.rcnn."):
            continue
        kk = k[len("head.fast_rcnn.rcnn."):]
        if pe_qk:
            kk = kk.replace("encoder.layers.", "layers.", 1)
        mapped[kk] = v
    missing, unexpected = model.load_state_dict(mapped, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing


@pytest.mark.parametrize("pe_qk", [True, False])
def test_tf_rcnn_parity(rng, pe_qk):
    cfg = _small_cfg(pe_qk)
    params = {"head": {"rcnn": tf_rcnn_init(jax.random.PRNGKey(0), cfg)}}

    model = TorchTfRCNN(cfg)
    _load_torch(model, params, cfg, pe_qk)

    b, r = 2, 5
    ph, pw, c = cfg.roi_pool_h, cfg.roi_pool_w, cfg.out_fpn_chan
    pooled = rng.normal(size=(b, r, c, ph, pw)).astype(np.float32)
    pe = rng.normal(size=(b, r, c, ph, pw)).astype(np.float32)
    with torch.no_grad():
        want_reg, want_cls = model(torch.tensor(pooled), torch.tensor(pe))

    pooled_j = jnp.asarray(np.moveaxis(pooled, 2, -1))  # (b, r, ph, pw, c)
    pe_j = jnp.asarray(np.moveaxis(pe, 2, -1))
    got_reg, got_cls = tf_rcnn_apply(params["head"]["rcnn"], pooled_j, pe_j, cfg)
    np.testing.assert_allclose(np.asarray(got_reg), want_reg.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_tf_rcnn_converter_roundtrip():
    cfg = _small_cfg(True)
    params = {"head": {"rcnn": tf_rcnn_init(jax.random.PRNGKey(3), cfg)}}
    sd = params_to_state_dict(params, cfg)
    back = state_dict_to_params(sd, cfg)
    flat_a = jax.tree_util.tree_leaves(params["head"]["rcnn"])
    flat_b = jax.tree_util.tree_leaves(back["head"]["rcnn"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
