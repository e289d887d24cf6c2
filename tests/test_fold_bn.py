"""fold_frozen_bn must preserve the eval forward for every backbone family.

At inference both frozen_batchnorm and batchnorm(training=False) are affine
constants (running stats, shared BN_EPS), so folding them into the preceding
conv's weights/bias is exact up to float reassociation — for resnets (the
flagship, reference backbone.py:116-132), vgg16_bn, and the efficientnet
b*/v2 families alike.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbone import backbone_init, backbone_apply
from birdsoundclassif_tpu.models.optimize import fold_frozen_bn

_BN_KEYS = {"scale", "bias", "mean", "var"}


def _randomize_bn(tree, key):
    """Give every BN leaf-dict non-trivial stats so the fold actually moves
    weights (inits are scale=1/mean=0/var=1, which fold to ~identity).

    The effective per-BN gain scale/sqrt(var+eps) is kept in ~[0.9, 1.1]:
    weights still move by up to ~10% (the no-op fold would be caught), but
    the network stays well-conditioned. With unconstrained gains a 40-block
    efficientnet amplifies activations to O(1e5) and becomes chaotic — a
    single 1e-7 rounding perturbation at the stem moves the deepest tap by
    ~30% (measured), which would drown the signal this test is after."""
    def walk(node):
        nonlocal key
        if isinstance(node, dict):
            if set(node) == _BN_KEYS:
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                ch = node["scale"].shape
                node["scale"] = 0.5 + jax.random.uniform(k1, ch)
                node["bias"] = jax.random.normal(k2, ch) * 0.1
                node["mean"] = jax.random.normal(k3, ch) * 0.1
                gain = 0.9 + 0.2 * jax.random.uniform(k4, ch)
                node["var"] = (node["scale"] / gain) ** 2
            else:
                for v in node.values():
                    walk(v)
    walk(tree)


@pytest.mark.parametrize(
    "backbone,norm",
    [
        ("resnet50", "frozen_batchnorm"),
        ("resnet50", "batchnorm"),  # live BN still affine at eval
        ("vgg16_bn", "frozen_batchnorm"),
        ("efficientnet_b0", "frozen_batchnorm"),
        ("efficientnet_v2_s", "frozen_batchnorm"),  # deepest family, head tap
    ],
)
def test_fold_preserves_eval_forward(backbone, norm):
    cfg = NbmConfig()
    cfg.backbone = backbone
    cfg.norm_layer_backbone = norm
    cfg.set_derived()
    params = backbone_init(jax.random.PRNGKey(0), cfg)
    _randomize_bn(params["body"], jax.random.PRNGKey(1))

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 128, 1))
    want, _ = backbone_apply(params, x, cfg)

    folded = fold_frozen_bn({"backbone": params}, cfg)["backbone"]
    # the fold must rewrite weights, not just BN constants
    assert not np.allclose(
        np.asarray(folded["body"]["stem_conv"]["w"]
                   if "efficientnet" in backbone
                   else folded["body"]["conv0" if "vgg" in backbone else "conv1"]["w"]),
        np.asarray(params["body"]["stem_conv"]["w"]
                   if "efficientnet" in backbone
                   else params["body"]["conv0" if "vgg" in backbone else "conv1"]["w"]),
    )
    got, _ = backbone_apply(folded, x, cfg)
    for g, w in zip(got, want):
        # fold = float reassociation, so compare at the tensor's own scale:
        # f32 rounding accumulated over the depth, amplified through
        # relu/silu boundaries, stays well under 1e-4 of the tensor max
        g, w = np.asarray(g), np.asarray(w)
        tol = 1e-4 * np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g, w, rtol=0, atol=tol)


@pytest.mark.parametrize("backbone", ["efficientnet_b0", "vgg16_bn"])
def test_load_model_folds_nonresnet_checkpoints(tmp_path, backbone):
    """load_model (infer CLI path) folds checkpoint-loaded trees for the
    non-resnet families too: the fold walks named keys, so this guards the
    npz-load tree structure staying in sync with fold_frozen_bn."""
    from birdsoundclassif_tpu.infer.pipeline import load_model
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.utils.checkpoint import save_params

    cfg = NbmConfig()
    cfg.backbone = backbone
    cfg.norm_layer_backbone = "frozen_batchnorm"
    cfg.num_classes = 6
    cfg.out_fpn_chan = 32
    cfg.fpn_p_chan = 48
    cfg.depth_rcnn = 1
    cfg.set_derived()
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    _randomize_bn(params["backbone"]["body"], jax.random.PRNGKey(1))
    save_params(str(tmp_path), params)
    cfg.save(str(tmp_path / "args"))

    loaded, lcfg = load_model(str(tmp_path))
    # the returned tree is folded: backbone BNs are identity constants
    body = loaded["backbone"]["body"]
    bn = body["stem_bn" if "efficientnet" in backbone else "bn0"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)

    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 128, 1))
    want = NbmModel.forward_first_stage(params, x, cfg, training=False)
    got = NbmModel.forward_first_stage(loaded, x, lcfg, training=False)
    for g, w in zip(got.fpn_out, want.fpn_out):
        # the full first stage computes in bf16 (eps ~4e-3), so the fold's
        # reassociation shows at bf16 scale here; tight f32 numerics are
        # covered by test_fold_preserves_eval_forward above
        g, w = np.asarray(g), np.asarray(w)
        np.testing.assert_allclose(g, w, rtol=0, atol=2e-2 * np.abs(w).max() + 1e-6)
