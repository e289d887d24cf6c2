"""fold_init_conv must preserve the eval forward for every backbone family.

The 1x1 init_conv (reference: backbone.py:104-113) feeds the stem conv with
no nonlinearity between, so the two compose into one conv — except at the
zero-padded border, where the stem conv pads the *3-channel* map (so the
init bias contributes only at in-bounds taps). The fold carries that as a
ones-map conv correction (optimize.py fold_init_conv, nn.stem_corr_add);
these tests pin the composition exactly, border rows included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbone import backbone_init, backbone_apply
from birdsoundclassif_tpu.models.optimize import (
    fold_frozen_bn,
    fold_init_conv,
    fold_inference,
)


def _make(backbone):
    cfg = NbmConfig()
    cfg.backbone = backbone
    cfg.set_derived()
    params = backbone_init(jax.random.PRNGKey(0), cfg)
    assert "init_conv" in params  # inpt_channels=1 default
    return cfg, params


@pytest.mark.parametrize(
    "backbone", ["resnet50", "vgg16_bn", "efficientnet_b0"]
)
def test_fold_preserves_eval_forward(backbone):
    cfg, params = _make(backbone)
    # give init_conv a non-trivial bias so the border correction is live
    params["init_conv"]["b"] = (
        params["init_conv"]["b"] + jnp.asarray([0.5, -0.3, 0.2])
    )
    # small input so border pixels are a large fraction of the map
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 33, 48, 1))
    want, _ = backbone_apply(params, x, cfg)

    folded = fold_init_conv({"backbone": params}, cfg)["backbone"]
    assert "init_conv" not in folded
    assert "stem_corr" in folded["body"]
    got, _ = backbone_apply(folded, x, cfg)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        tol = 1e-4 * np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g, w, rtol=0, atol=tol)


def test_border_correction_is_exact_not_constant():
    """The naive constant-bias composition is wrong at the border; assert
    our correction actually varies there (i.e. the test above would catch
    the naive version)."""
    cfg, params = _make("resnet50")
    params["init_conv"]["b"] = jnp.asarray([1.0, -2.0, 0.7])
    folded = fold_init_conv({"backbone": params}, cfg)["backbone"]
    kb = folded["body"]["stem_corr"]["w"]
    from birdsoundclassif_tpu.models import nn as fnn

    corr = fnn.conv2d({"w": kb}, jnp.ones((1, 33, 48, 1)), stride=2, padding=3)
    c = np.asarray(corr)[0]
    # interior equals the full-kernel sum; the corner must differ
    interior = c[c.shape[0] // 2, c.shape[1] // 2]
    assert not np.allclose(c[0, 0], interior)
    np.testing.assert_allclose(
        interior, np.asarray(kb.sum(axis=(0, 1, 2))), rtol=1e-5
    )


def test_fold_inference_composes_both_folds():
    """fold_inference = init-conv fold applied on the BN-folded tree; the
    stacked result must still match the raw eval forward."""
    cfg, params = _make("resnet50")
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 40, 64, 1))
    want, _ = backbone_apply(params, x, cfg)
    folded = fold_inference({"backbone": params}, cfg)["backbone"]
    assert "init_conv" not in folded and "stem_corr" in folded["body"]
    got, _ = backbone_apply(folded, x, cfg)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        tol = 1e-4 * np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g, w, rtol=0, atol=tol)


def test_fold_noop_without_init_conv():
    cfg = NbmConfig()
    cfg.inpt_channels = 3
    cfg.set_derived()
    params = {"backbone": backbone_init(jax.random.PRNGKey(0), cfg)}
    assert "init_conv" not in params["backbone"]
    out = fold_init_conv(params, cfg)
    assert out is params  # untouched, not copied


def test_detector_first_stage_matches_after_fold():
    """Integration guard: the detector's first-stage forward (backbone →
    attn → FPN → RPN → proposals) is unchanged by fold_inference within
    float tolerance. f32 compute so the only delta is the fold's own
    reassociation, not bf16 noise; FPN maps are compared (NMS-selected
    boxes would be brittle under random init weights near score ties)."""
    from birdsoundclassif_tpu.models.detector import NbmModel

    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 375, 1024, 1))
    want = NbmModel.forward_first_stage(params, x, cfg, training=False)
    got = NbmModel.forward_first_stage(
        fold_inference(params, cfg), x, cfg, training=False
    )
    for g, w in zip(got.fpn_out, want.fpn_out):
        g, w = np.asarray(g), np.asarray(w)
        tol = 1e-4 * np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g, w, rtol=0, atol=tol)
