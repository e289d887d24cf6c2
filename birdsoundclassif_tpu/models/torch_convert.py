"""Torch checkpoint <-> JAX pytree conversion.

Maps the reference's state_dict key space (NbmModel built in
nbm_model.py:344-381: backbone Joiner '0', SAPyramid, FPN, Faster_RCNN head)
onto our param pytree. Layout transforms:

  * conv weight (O, I, kh, kw) -> HWIO
  * linear weight (O, I) -> (I, O)
  * the two RCNN output linears additionally permute their input rows:
    torch flattens RoI features as (C, ph, pw), we flatten (ph, pw, C)
    (see models/rcnn.py)
  * BatchNorm/FrozenBatchNorm: weight/bias/running_mean/running_var ->
    scale/bias/mean/var (num_batches_tracked dropped, matching the
    reference's FrozenBatchNorm2d load hook, backbone.py:42-50)

The inverse direction (params -> torch state_dict) exists so the mapping is
round-trip tested without a real checkpoint (the reference snapshot ships
only git-LFS pointers for model_chkpt.pt).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_t2j(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv_j2t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _lin_t2j(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _rcnn_lin_t2j(w: np.ndarray, c: int, ph: int, pw: int) -> np.ndarray:
    """(out, C*ph*pw) -> (ph*pw*C, out) with the flatten-layout permute."""
    out = w.shape[0]
    return np.ascontiguousarray(
        w.reshape(out, c, ph, pw).transpose(2, 3, 1, 0).reshape(ph * pw * c, out)
    )


def _rcnn_lin_j2t(w: np.ndarray, c: int, ph: int, pw: int) -> np.ndarray:
    out = w.shape[1]
    return np.ascontiguousarray(
        w.reshape(ph, pw, c, out).transpose(3, 2, 0, 1).reshape(out, c * ph * pw)
    )


def _bn_pairs(prefix_t: str):
    return [
        (prefix_t + ".weight", "scale"),
        (prefix_t + ".bias", "bias"),
        (prefix_t + ".running_mean", "mean"),
        (prefix_t + ".running_var", "var"),
    ]


def key_map(cfg) -> Dict[str, Tuple[str, str]]:
    """-> {torch_key: (jax_path, transform)} where transform in
    {conv, lin, rcnn_lin, mha_w, mha_b, raw}. The mha_* kinds map a packed
    torch in_proj tensor onto *three* leaves under jax_path (q/k/v) rather
    than a single flat key."""
    m: Dict[str, Tuple[str, str]] = {}

    def conv(tk, jk, bias=True):
        m[tk + ".weight"] = (jk + "/w", "conv")
        if bias:
            m[tk + ".bias"] = (jk + "/b", "raw")

    def lin(tk, jk):
        m[tk + ".weight"] = (jk + "/w", "lin")
        m[tk + ".bias"] = (jk + "/b", "raw")

    def bn(tk, jk):
        for t_suffix, j_name in _bn_pairs(tk):
            m[t_suffix] = (jk + "/" + j_name, "raw")

    # ---- backbone (Joiner '0') ----
    if cfg.inpt_channels != 3:
        conv("backbone.0.init_conv", "backbone/init_conv")
    b = "backbone.0.body"
    j = "backbone/body"
    if "vgg" in cfg.backbone:
        # IntermediateLayerGetter over vgg16_bn.features keeps the original
        # child indices (conv/bn/relu triplets + maxpools, backbone.py:78-80)
        from .backbones_extra import _VGG16_CFG

        tv_idx = conv_i = 0
        for v in _VGG16_CFG:
            if v == "M":
                tv_idx += 1
                continue
            conv(f"{b}.{tv_idx}", f"{j}/conv{conv_i}")
            bn(f"{b}.{tv_idx + 1}", f"{j}/bn{conv_i}")
            tv_idx += 3
            conv_i += 1
    elif "efficientnet" in cfg.backbone:
        # IntermediateLayerGetter over efficientnet.features: index 0 is the
        # stem Conv2dNormActivation, indices 1..N the stages of MBConv /
        # FusedMBConv blocks, and (v2 only) index N+1 the 1x1 head CNA
        from .backbones_extra import _EFFNET_V2_STAGES, efficientnet_block_specs

        conv(f"{b}.0.0", f"{j}/stem_conv", bias=False)
        bn(f"{b}.0.1", f"{j}/stem_bn")
        for si, bi, fused, expand, use_se in efficientnet_block_specs(cfg.backbone):
            tb = f"{b}.{si + 1}.{bi}.block"
            jb = f"{j}/stage{si}/{bi}"
            if fused:
                conv(f"{tb}.0.0", f"{jb}/fused_conv", bias=False)
                bn(f"{tb}.0.1", f"{jb}/fused_bn")
                if expand != 1:
                    conv(f"{tb}.1.0", f"{jb}/project_conv", bias=False)
                    bn(f"{tb}.1.1", f"{jb}/project_bn")
                continue
            idx = 0
            if expand != 1:
                conv(f"{tb}.0.0", f"{jb}/expand_conv", bias=False)
                bn(f"{tb}.0.1", f"{jb}/expand_bn")
                idx = 1
            conv(f"{tb}.{idx}.0", f"{jb}/dw_conv", bias=False)
            bn(f"{tb}.{idx}.1", f"{jb}/dw_bn")
            if use_se:
                conv(f"{tb}.{idx + 1}.fc1", f"{jb}/se_reduce")
                conv(f"{tb}.{idx + 1}.fc2", f"{jb}/se_expand")
            conv(f"{tb}.{idx + 2}.0", f"{jb}/project_conv", bias=False)
            bn(f"{tb}.{idx + 2}.1", f"{jb}/project_bn")
        if cfg.backbone.startswith("efficientnet_v2"):
            head_i = len(_EFFNET_V2_STAGES[cfg.backbone]) + 1
            conv(f"{b}.{head_i}.0", f"{j}/head_conv", bias=False)
            bn(f"{b}.{head_i}.1", f"{j}/head_bn")
    else:
        conv(b + ".conv1", j + "/conv1", bias=False)
        bn(b + ".bn1", j + "/bn1")
        from .backbone import RESNET_SPECS

        spec = RESNET_SPECS[cfg.backbone]
        for stage, n_blocks in enumerate(spec["layers"]):
            for blk in range(n_blocks):
                tb = f"{b}.layer{stage + 1}.{blk}"
                jb = f"{j}/layer{stage + 1}/{blk}"
                for ci in (1, 2, 3):
                    conv(f"{tb}.conv{ci}", f"{jb}/conv{ci}", bias=False)
                    bn(f"{tb}.bn{ci}", f"{jb}/bn{ci}")
                if blk == 0:
                    conv(f"{tb}.downsample.0", f"{jb}/downsample/conv", bias=False)
                    bn(f"{tb}.downsample.1", f"{jb}/downsample/bn")

    # ---- learned PE (Joiner index 1, position_encoding.py:59-83) ----
    if cfg.position_embedding in ("learned", "v3"):
        m["backbone.1.row_embed.weight"] = ("backbone/pos_embed/row_embed", "raw")
        m["backbone.1.col_embed.weight"] = ("backbone/pos_embed/col_embed", "raw")

    # ---- attention pyramid ----
    n_layers = cfg.n_layers
    top_n = cfg.pyramid_top_n_attn
    attn_levels = range(n_layers) if top_n == n_layers else range(n_layers - top_n, n_layers)
    for i in attn_levels:
        for name in ("query", "key", "value", "final_projection"):
            lin(f"attn.attention_modules.{i}.{name}", f"attn/{i}/{name}")

    def dsc(tk, jk, pe=False):
        conv(tk + ".depth_wise", jk + "/depth_wise")
        conv(tk + ".pt_wise", jk + "/pt_wise")
        bn(tk + ".norm", jk + "/norm")
        if pe:
            conv(tk + ".pe_proj", jk + "/pe_proj")

    # ---- FPN / BiFPN ----
    if cfg.fpn == "fpn":
        for i in range(n_layers):
            conv(f"fpn.pt_wise.{i}", f"fpn/pt_wise/{i}")
            conv(f"fpn.out_convs.{i}", f"fpn/out_convs/{i}")
    elif cfg.fpn == "bifpn":
        # reference: BiFPNLayer (fpn.py:47-100) — Rescale pt_wise convs exist
        # only where adjacent channel counts differ
        from .backbone import backbone_channels

        chans = backbone_channels(cfg.backbone)
        for layer in range(cfg.n_bifpn_layers):
            bt, bj = f"fpn.layers.{layer}", f"fpn/layers/{layer}"
            for i in range(1, n_layers):  # td rescale i: channels[i]->channels[i-1]
                if chans[i] != chans[i - 1]:
                    conv(f"{bt}.rescalings_td.{i}.pt_wise",
                         f"{bj}/rescalings_td/{i}/pt_wise")
            for i in range(n_layers - 1):  # bu rescale i: channels[i]->channels[i+1]
                if chans[i] != chans[i + 1]:
                    conv(f"{bt}.rescalings_bu.{i}.pt_wise",
                         f"{bj}/rescalings_bu/{i}/pt_wise")
            for i in range(1, n_layers - 1):
                m[f"{bt}.fusions_td.{i}.weights"] = (
                    f"{bj}/fusions_td/{i}/weights", "raw")
                dsc(f"{bt}.fusions_td.{i}.conv", f"{bj}/fusions_td/{i}/conv")
            for i in range(n_layers):
                m[f"{bt}.fusions_bu.{i}.weights"] = (
                    f"{bj}/fusions_bu/{i}/weights", "raw")
                dsc(f"{bt}.fusions_bu.{i}.conv", f"{bj}/fusions_bu/{i}/conv")
            if layer == cfg.n_bifpn_layers - 1:
                for i in range(n_layers):
                    conv(f"{bt}.out_pt_wise_convs.{i}", f"{bj}/out_pt_wise_convs/{i}")

    # ---- head: RPN ----
    for i in range(n_layers):
        dsc(f"head.rpn.convs.{i}", f"head/rpn/convs/{i}")
        conv(f"head.rpn.cls_score.{i}", f"head/rpn/cls_score/{i}")
        conv(f"head.rpn.bbox_reg.{i}", f"head/rpn/bbox_reg/{i}")

    # ---- head: RCNN (conv variant or Transformer_RCNN, layers.py:661-664) ----
    rc_t = "head.fast_rcnn.rcnn"
    rc_j = "head/rcnn"
    if cfg.tf_rcnn:
        # Transformer_RCNN (layers.py:589-651). The embedding linears consume
        # the RoI flatten, so their weights need the (C,ph,pw)->(ph,pw,C)
        # row permute; the output heads consume model_dim tokens (plain lin).
        for name in ("pos_embedding", "rois_embedding"):
            m[f"{rc_t}.{name}.0.weight"] = (f"{rc_j}/{name}/w", "rcnn_lin")
            m[f"{rc_t}.{name}.0.bias"] = (f"{rc_j}/{name}/b", "raw")
        for i in range(cfg.tf_num_encoder_layers):
            te = f"{rc_t}.encoder.layers.{i}"
            je = f"{rc_j}/layers/{i}"
            m[te + ".self_attn.in_proj_weight"] = (je + "/self_attn", "mha_w")
            m[te + ".self_attn.in_proj_bias"] = (je + "/self_attn", "mha_b")
            lin(te + ".self_attn.out_proj", je + "/self_attn/out")
            lin(te + ".linear1", je + "/linear1")
            lin(te + ".linear2", je + "/linear2")
            for n in ("norm1", "norm2"):
                m[f"{te}.{n}.weight"] = (f"{je}/{n}/scale", "raw")
                m[f"{te}.{n}.bias"] = (f"{je}/{n}/bias", "raw")
        lin(rc_t + ".bbox_reg_layer", rc_j + "/bbox_reg_layer")
        lin(rc_t + ".bbox_classif_layer", rc_j + "/bbox_classif_layer")
    else:
        conv(rc_t + ".pe_proj", rc_j + "/pe_proj")
        for i in range(cfg.depth_rcnn):
            dsc(f"{rc_t}.rcnn.{i}", f"{rc_j}/blocks/{i}", pe=True)
        m[rc_t + ".bbox_reg_layer.weight"] = (rc_j + "/bbox_reg_layer/w", "rcnn_lin")
        m[rc_t + ".bbox_reg_layer.bias"] = (rc_j + "/bbox_reg_layer/b", "raw")
        m[rc_t + ".bbox_classif_layer.weight"] = (rc_j + "/bbox_classif_layer/w", "rcnn_lin")
        m[rc_t + ".bbox_classif_layer.bias"] = (rc_j + "/bbox_classif_layer/b", "raw")
    return m


def state_dict_to_params(
    state_dict: Dict[str, np.ndarray], cfg, init_params: Any = None
) -> Any:
    """torch state_dict (numpy values) -> our nested param dict.

    When init_params is given, absent checkpoint keys keep their init
    values — the reference's partial state-dict merge
    (nbm_model.py:325-341)."""
    from ..utils.checkpoint import _flatten, _unflatten

    mapping = key_map(cfg)
    c, ph, pw = cfg.out_fpn_chan, cfg.roi_pool_h, cfg.roi_pool_w
    flat: Dict[str, np.ndarray] = dict(_flatten(init_params)) if init_params else {}
    missing = []
    for tk, (jk, kind) in mapping.items():
        if tk not in state_dict:
            missing.append(tk)
            continue
        v = np.asarray(state_dict[tk], dtype=np.float32)
        try:
            if kind == "conv":
                v = _conv_t2j(v)
            elif kind == "lin":
                v = _lin_t2j(v)
            elif kind == "rcnn_lin":
                v = _rcnn_lin_t2j(v, c, ph, pw)
            elif kind == "mha_w":
                # packed torch in_proj_weight (3d, d) -> q/k/v (d, d) each
                d = cfg.tf_model_dim
                if v.shape != (3 * d, d):
                    raise ValueError(f"expected in_proj_weight ({3 * d}, {d})")
                for n, chunk in zip(("q", "k", "v"), (v[:d], v[d : 2 * d], v[2 * d :])):
                    flat[f"{jk}/{n}/w"] = _lin_t2j(chunk)
                continue
            elif kind == "mha_b":
                d = cfg.tf_model_dim
                if v.shape != (3 * d,):
                    raise ValueError(f"expected in_proj_bias ({3 * d},)")
                for n, chunk in zip(("q", "k", "v"), (v[:d], v[d : 2 * d], v[2 * d :])):
                    flat[f"{jk}/{n}/b"] = np.ascontiguousarray(chunk)
                continue
        except ValueError as e:
            raise ValueError(
                f"checkpoint/config mismatch converting '{tk}' "
                f"(shape {v.shape}, kind {kind}): {e}"
            ) from None
        flat[jk] = v
    if missing:
        print(
            f"torch_convert: {len(missing)} keys absent from checkpoint "
            f"(e.g. {missing[:3]})"
        )
    return _unflatten(flat)


def params_to_state_dict(params: Any, cfg) -> Dict[str, np.ndarray]:
    """Inverse mapping for round-trip tests and torch export."""
    from ..utils.checkpoint import _flatten

    flat = _flatten(params)
    mapping = key_map(cfg)
    c, ph, pw = cfg.out_fpn_chan, cfg.roi_pool_h, cfg.roi_pool_w
    out: Dict[str, np.ndarray] = {}
    for tk, (jk, kind) in mapping.items():
        if kind in ("mha_w", "mha_b"):
            suffix = "w" if kind == "mha_w" else "b"
            parts = [flat.get(f"{jk}/{n}/{suffix}") for n in ("q", "k", "v")]
            if any(p is None for p in parts):
                continue
            parts = [np.asarray(p, dtype=np.float32) for p in parts]
            if kind == "mha_w":
                parts = [np.ascontiguousarray(p.T) for p in parts]
            out[tk] = np.concatenate(parts, axis=0)
            continue
        if jk not in flat:
            continue
        v = np.asarray(flat[jk], dtype=np.float32)
        if kind == "conv":
            v = _conv_j2t(v)
        elif kind == "lin":
            v = np.ascontiguousarray(v.T)
        elif kind == "rcnn_lin":
            v = _rcnn_lin_j2t(v, c, ph, pw)
        out[tk] = v
    return out


def convert_torch_checkpoint(path: str, cfg, init_params: Any = None) -> Any:
    """Load a reference model_chkpt.pt and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["checkpoints"] if "checkpoints" in ckpt else ckpt
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()}
    if init_params is None:
        import jax

        from .detector import NbmModel

        init_params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    return state_dict_to_params(state_np, cfg, init_params)


def main(argv=None) -> int:
    """`nbm-convert` console script: convert a checkpoint between the
    reference torch format (model_chkpt.pt, loaded by
    run_detection.py:87-122) and this package's flat params.npz. The
    input dir must hold an `args` config plus either format; the config
    is copied alongside the converted weights so the output dir is a
    complete --ckpt for nbm-detect / nbm-train."""
    import argparse
    import os

    p = argparse.ArgumentParser("NBM checkpoint converter")
    p.add_argument("--ckpt", required=True,
                   help="model dir with args + (model_chkpt.pt | params.npz | orbax/)")
    p.add_argument("--out", required=True, help="output model dir")
    p.add_argument("--to", choices=("npz", "torch"), default="npz",
                   help="output format (default npz)")
    a = p.parse_args(argv)

    from ..config import NbmConfig
    from ..utils.checkpoint import load_params, save_params

    cfg = NbmConfig.load(os.path.join(a.ckpt, "args"))
    params = load_params(a.ckpt, cfg)  # npz / orbax / torch, whichever exists
    os.makedirs(a.out, exist_ok=True)
    if a.to == "npz":
        path = save_params(a.out, params)
    else:
        import torch

        sd = {
            k: torch.tensor(np.asarray(v))
            for k, v in params_to_state_dict(params, cfg).items()
        }
        path = os.path.join(a.out, "model_chkpt.pt")
        torch.save({"checkpoints": sd}, path)
    cfg.save(os.path.join(a.out, "args"))
    print(f"wrote {path}")
    return 0
