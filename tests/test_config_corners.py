"""Config-surface corner coverage (VERDICT r1 weak #5 / next #8): the
corners reachable from NbmConfig — dilation, n_ratios=5, add_posenc,
learned PE through the converter, reference-style args JSON — must either
run a real forward (+ converter round trip) or fail loudly."""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.detector import NbmModel


def tiny_cfg(**kw):
    cfg = NbmConfig()
    cfg.num_classes = 5
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN_eval = 64
    cfg.post_nms_topN_eval = 16
    cfg.compute_dtype = "float32"
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.set_derived()
    return cfg


def _forward(cfg, b=1):
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).random(
        (b, cfg.img_height, cfg.img_width, 1), np.float32))
    det = NbmModel.forward(params, x, cfg, nms_thresh=0.3, min_score=0.0)
    assert np.isfinite(np.asarray(det.scores)).all()
    return params, det


def _convert_round_trip(params, cfg):
    """params -> torch-style state dict -> params, must be bitwise equal."""
    import torch

    from birdsoundclassif_tpu.models.torch_convert import (
        params_to_state_dict,
        state_dict_to_params,
    )

    sd = {k: torch.tensor(np.asarray(v))
          for k, v in params_to_state_dict(params, cfg).items()}
    back = state_dict_to_params(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        k = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[k]), err_msg=k)


def test_dilation_forward_and_converter():
    """replace_stride_with_dilation on layer4 (reference: backbone.py:130)."""
    cfg = tiny_cfg(dilation=True)
    params, _ = _forward(cfg)
    # dilation keeps layer4 at the stride of layer3: top two taps same size
    from birdsoundclassif_tpu.models.backbone import backbone_apply

    feats, _ = backbone_apply(
        params["backbone"], jnp.zeros((1, 128, 256, 1)), cfg
    )
    assert feats[-1].shape[1:3] == feats[-2].shape[1:3]
    _convert_round_trip(params, cfg)


def test_n_ratios_5_forward_and_anchors():
    """5-ratio anchor grid (reference: setattr_others, nets_utils.py:407)."""
    cfg = tiny_cfg(n_ratios=5)
    assert cfg.ratios == (0.2, 0.5, 1.0, 2.0, 5.0)
    assert cfg.num_anchors_per_cell == 25
    from birdsoundclassif_tpu.ops.anchors import full_anchor_grid

    th, tw = cfg.top_size
    grid = full_anchor_grid(cfg.base_size, tuple(cfg.ratios), tuple(cfg.scales),
                            tw, th, cfg.anchor_stride)
    assert grid.shape == (th * tw * 25, 4)
    params, _ = _forward(cfg)
    _convert_round_trip(params, cfg)


def test_unsupported_n_ratios_fails_loudly():
    with pytest.raises(ValueError, match="n_ratios"):
        tiny_cfg(n_ratios=4)


def test_add_posenc_forward():
    """features += PE before attn/FPN (reference: nbm_model.py:45-46)."""
    cfg = tiny_cfg(add_posenc=True)
    _forward(cfg)


def test_learned_pe_converter_round_trip():
    cfg = tiny_cfg(position_embedding="learned")
    params, _ = _forward(cfg)
    _convert_round_trip(params, cfg)


def test_reference_style_args_json_drives_forward(tmp_path):
    """A reference-format args dump (train.py:286-288 writes args.__dict__,
    including the derived fields as lists) must load and run."""
    cfg = tiny_cfg()
    d = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(NbmConfig)}
    # the reference dump carries derived fields + extra torch-only keys
    d["ratios"] = [0.5, 1.0, 2.0]
    d["scales"] = [1, 2, 4, 8, 16]
    d["n_layers"] = 5
    d["top_size"] = [24, 64]
    d["device"] = "cuda"
    d["world_size"] = 1          # unknown keys must be ignored
    d["dist_url"] = "env://"
    path = tmp_path / "args"
    path.write_text(json.dumps(d))
    loaded = NbmConfig.load(str(path))
    assert loaded.num_classes == cfg.num_classes
    assert loaded.ratios == (0.5, 1.0, 2.0)   # recomputed, tuple not list
    assert loaded.top_size == (24, 64)
    _forward(loaded)


def test_cli_parser_round_trips_scientific_and_bools():
    from birdsoundclassif_tpu.train.driver import build_arg_parser

    p = build_arg_parser()
    a = p.parse_args(["--max_steps", "5e5", "--focal_loss", "true",
                      "--remat_backbone", "false", "--lr", "3e-4"])
    assert a.max_steps == 5e5 and a.lr == 3e-4
    assert a.focal_loss is True and a.remat_backbone is False
    # reference-style bare store_true flags work (train.py:52-145) ...
    bare = p.parse_args(["--focal_loss", "--fpn_first"])
    assert bare.focal_loss is True and bare.fpn_first is True
    # ... and a typo'd value is an error, never silently True
    with pytest.raises(SystemExit):
        p.parse_args(["--focal_loss", "nope"])
    # no declared NbmConfig field has a container type the parser can't cast
    for f in dataclasses.fields(NbmConfig):
        if f.default is not None:
            assert isinstance(f.default, (bool, int, float, str)), f.name
