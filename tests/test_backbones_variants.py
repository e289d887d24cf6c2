"""Shape/semantics tests for the VGG/EfficientNet backbones and the
Transformer-RCNN head on a reduced geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.backbone import backbone_init, backbone_apply, backbone_channels


def make_cfg(backbone, **kw):
    cfg = NbmConfig()
    cfg.backbone = backbone
    cfg.set_derived()
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestBackboneVariants:
    @pytest.mark.parametrize(
        "name,n_levels",
        [("vgg16_bn", 4), ("efficientnet_b0", 5), ("efficientnet_v2_s", 5)],
    )
    def test_shapes_and_channels(self, name, n_levels):
        cfg = make_cfg(name)
        assert cfg.n_layers == n_levels
        params = backbone_init(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 160, 256, 1))
        feats, pos = backbone_apply(params, x, cfg)
        assert len(feats) == n_levels
        chans = backbone_channels(name)
        for f, c, p in zip(feats, chans, pos):
            assert f.shape[-1] == c
            assert p.shape[-1] == c  # one_dim_posenc matches feature channels
        # strides double per level
        hs = [f.shape[1] for f in feats]
        for a, b in zip(hs[:-1], hs[1:]):
            assert a >= b

    def test_vgg_stride_sequence(self):
        cfg = make_cfg("vgg16_bn")
        params = backbone_init(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 375, 1024, 1))
        feats, _ = backbone_apply(params, x, cfg)
        # taps at strides 2, 4, 8, 16
        assert [f.shape[1] for f in feats] == [187, 93, 46, 23]
        assert [f.shape[2] for f in feats] == [512, 256, 128, 64]

    def test_efficientnet_train_mode_collects_bn(self):
        # b0-b4 honor norm_layer_backbone='frozen_batchnorm' (the default,
        # matching reference backbone.py:123-131): no batch stats collected
        cfg = make_cfg("efficientnet_b0")
        params = backbone_init(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 96, 128, 1))
        bn = {}
        backbone_apply(params, x, cfg, training=True, bn_updates=bn)
        assert not bn
        # ...but run live BN when the flag asks for plain batchnorm
        cfg_live = make_cfg("efficientnet_b0", norm_layer_backbone="batchnorm")
        bn = {}
        backbone_apply(params, x, cfg_live, training=True, bn_updates=bn)
        assert any("stem_bn" in k for k in bn)
        assert all(set(v) == {"mean", "var"} for v in bn.values())

    def test_efficientnet_v2_exempt_from_frozen_bn(self):
        # the reference's norm_layer kwarg skips the v2 family
        # (backbone.py:123-131): live BN even under frozen_batchnorm
        cfg = make_cfg("efficientnet_v2_s")
        params = backbone_init(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 96, 128, 1))
        bn = {}
        backbone_apply(params, x, cfg, training=True, bn_updates=bn)
        assert any("stem_bn" in k for k in bn)
        assert all(set(v) == {"mean", "var"} for v in bn.values())


class TestTfRCNN:
    def test_forward_shapes(self):
        from birdsoundclassif_tpu.models.tf_rcnn import tf_rcnn_init, tf_rcnn_apply

        cfg = NbmConfig()
        cfg.num_classes = 5
        cfg.out_fpn_chan = 16
        cfg.tf_model_dim = 32
        cfg.tf_dim_feedforward = 64
        cfg.tf_num_encoder_layers = 2
        params = tf_rcnn_init(jax.random.PRNGKey(0), cfg)
        b, r = 2, 7
        pooled = jnp.ones((b, r, 2, 2, 16))
        pe = jnp.ones((b, r, 2, 2, 16))
        reg, cls = tf_rcnn_apply(params, pooled, pe, cfg)
        assert reg.shape == (b * r, 4 * 6)
        assert cls.shape == (b * r, 6)
        np.testing.assert_allclose(np.asarray(cls.sum(-1)), 1.0, rtol=1e-5)

    def test_detector_with_tf_rcnn(self):
        from birdsoundclassif_tpu.models.detector import NbmModel

        cfg = NbmConfig()
        cfg.num_classes = 5
        cfg.out_fpn_chan = 16
        cfg.fpn_p_chan = 24
        cfg.tf_rcnn = True
        cfg.tf_model_dim = 32
        cfg.tf_dim_feedforward = 64
        cfg.tf_num_encoder_layers = 1
        cfg.img_height, cfg.img_width = 128, 256
        cfg.pre_nms_topN_eval = 64
        cfg.post_nms_topN_eval = 16
        params = NbmModel.init(jax.random.PRNGKey(0), cfg)
        det = NbmModel.forward(params, jnp.zeros((1, 128, 256, 1)), cfg, min_score=0.0)
        assert det.boxes.shape == (1, 16, 4)
