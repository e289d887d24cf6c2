"""BiFPN activation parity vs a torch reconstruction of the reference
modules (reference: fpn.py:9-115), weights shared via direct array copy
(BiFPN is not in the torch-checkpoint key map: the shipped model uses the
standard FPN)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.fpn import bifpn_init, bifpn_apply


class TorchDSC(tnn.Module):
    def __init__(self, cn):
        super().__init__()
        self.depth_wise = tnn.Conv2d(cn, 4 * cn, 3, padding=1, groups=cn)
        self.pt_wise = tnn.Conv2d(4 * cn, cn, 1)
        self.norm = tnn.BatchNorm2d(cn)

    def forward(self, x):
        self.norm.eval()
        return F.silu(self.norm(self.pt_wise(self.depth_wise(x))))


class TorchFusion(tnn.Module):
    def __init__(self, n_ends, cn):
        super().__init__()
        self.weights = tnn.Parameter(torch.ones(n_ends))
        self.conv = TorchDSC(cn)

    def forward(self, inputs):
        w = F.relu(self.weights)
        num = 0
        for wi, x in zip(w, inputs):
            num = num + wi * x
        return self.conv(num / (w.sum() + 1e-4))


class TorchRescale(tnn.Module):
    def __init__(self, in_cn, out_cn):
        super().__init__()
        self.pt_wise = tnn.Conv2d(in_cn, out_cn, 1) if in_cn != out_cn else None

    def forward(self, x, out_size):
        out = F.interpolate(x, size=out_size, mode="bilinear", align_corners=True)
        return self.pt_wise(out) if self.pt_wise is not None else out


def _copy_conv(tmod, jp):
    tmod.weight.data = torch.tensor(np.asarray(jp["w"]).transpose(3, 2, 0, 1))
    if tmod.bias is not None and "b" in jp:
        tmod.bias.data = torch.tensor(np.asarray(jp["b"]))


def _copy_dsc(tmod, jp):
    _copy_conv(tmod.depth_wise, jp["depth_wise"])
    _copy_conv(tmod.pt_wise, jp["pt_wise"])
    tmod.norm.weight.data = torch.tensor(np.asarray(jp["norm"]["scale"]))
    tmod.norm.bias.data = torch.tensor(np.asarray(jp["norm"]["bias"]))
    tmod.norm.running_mean.data = torch.tensor(np.asarray(jp["norm"]["mean"]))
    tmod.norm.running_var.data = torch.tensor(np.asarray(jp["norm"]["var"]))


def test_bifpn_layer_parity(rng):
    channels = [8, 12, 16]
    n_layers = 2
    out_cn = 10
    params = bifpn_init(jax.random.PRNGKey(3), n_layers, channels, out_cn)

    # torch reconstruction per layer (reference: BiFPNLayer.forward)
    def run_torch_layer(lp, inputs, last):
        n = len(inputs)
        sizes = [tuple(x.shape[-2:]) for x in inputs]
        td_resc, bu_resc, td_fus, bu_fus, out_convs = {}, {}, {}, {}, {}
        for i, (out_c, in_c) in enumerate(zip(channels[:-1], channels[1:])):
            m = TorchRescale(in_c, out_c)
            if m.pt_wise is not None:
                _copy_conv(m.pt_wise, lp["rescalings_td"][str(i + 1)]["pt_wise"])
            td_resc[i + 1] = m
        for i, (in_c, out_c) in enumerate(zip(channels[:-1], channels[1:])):
            m = TorchRescale(in_c, out_c)
            if m.pt_wise is not None:
                _copy_conv(m.pt_wise, lp["rescalings_bu"][str(i)]["pt_wise"])
            bu_resc[i] = m
        for i, cn in enumerate(channels[1:-1]):
            m = TorchFusion(2, cn)
            m.weights.data = torch.tensor(np.asarray(lp["fusions_td"][str(i + 1)]["weights"]))
            _copy_dsc(m.conv, lp["fusions_td"][str(i + 1)]["conv"])
            td_fus[i + 1] = m
        for i, cn in enumerate(channels):
            m = TorchFusion(2 if i in [0, n - 1] else 3, cn)
            m.weights.data = torch.tensor(np.asarray(lp["fusions_bu"][str(i)]["weights"]))
            _copy_dsc(m.conv, lp["fusions_bu"][str(i)]["conv"])
            bu_fus[i] = m
        if last:
            for i, cn in enumerate(channels):
                c = tnn.Conv2d(cn, out_cn, 1)
                _copy_conv(c, lp["out_pt_wise_convs"][str(i)])
                out_convs[i] = c
        with torch.no_grad():
            td_out = inputs[-1]
            td_outs = [td_out]
            for i in range(n - 2, 0, -1):
                td_out = td_fus[i]([inputs[i], td_resc[i + 1](td_out, sizes[i])])
                td_outs.insert(0, td_out)
            td_outs.insert(0, td_resc[1](td_out, sizes[0]))
            bu_out = bu_fus[0]([inputs[0], td_outs[0]])
            bu_outs = [bu_out]
            for i in range(1, n - 1):
                bu_out = bu_fus[i]([inputs[i], td_outs[i], bu_resc[i - 1](bu_out, sizes[i])])
                bu_outs.append(bu_out)
            bu_outs.append(bu_fus[n - 1]([inputs[-1], bu_resc[n - 2](bu_out, sizes[-1])]))
            if last:
                bu_outs = [out_convs[i](b) for i, b in enumerate(bu_outs)]
        return bu_outs

    shapes = [(24, 32), (12, 16), (6, 8)]
    feats_t = [torch.tensor(rng.normal(size=(1, c, h, w)).astype(np.float32))
               for c, (h, w) in zip(channels, shapes)]
    outs_t = feats_t
    for li in range(n_layers):
        outs_t = run_torch_layer(params["layers"][str(li)], outs_t, li == n_layers - 1)

    feats_j = [jnp.asarray(np.moveaxis(f.numpy(), 1, -1)) for f in feats_t]
    outs_j = bifpn_apply(params, feats_j)
    for i, (gj, gt) in enumerate(zip(outs_j, outs_t)):
        g = np.moveaxis(np.asarray(gj), -1, 1)
        np.testing.assert_allclose(g, gt.numpy(), rtol=1e-3, atol=1e-4,
                                   err_msg=f"bifpn out level {i}")
