"""rpn_head_f32: the stage-1 head computes in float32 under a bfloat16
trunk (the bistable-takeoff root fix, config.py rpn_head_f32 /
docs/BENCH.md r5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.rpn import rpn_apply, rpn_init


@pytest.fixture(scope="module")
def tiny_cfg():
    # rpn_head_f32 defaults True since the r5 A/B; this fixture is the
    # explicit bf16-head baseline the tests compare against
    return NbmConfig(img_height=128, img_width=256, out_fpn_chan=16,
                     fpn_p_chan=24, batch_size=1, rpn_head_f32=False)


def _feats(cfg, rng):
    # five pyramid levels at strides 4..64 of a 128x256 input, out_fpn_chan
    feats = []
    for i in range(cfg.n_layers):
        s = 4 * 2 ** i
        feats.append(rng.standard_normal(
            (1, cfg.img_height // s, cfg.img_width // s, cfg.out_fpn_chan)
        ).astype(np.float32) * 30.0)  # hot activations, like the r4 FPN
    return feats


def test_rpn_head_f32_matches_full_precision(tiny_cfg):
    """With the flag ON, a bf16 trunk handing bf16 features to the RPN must
    produce the SAME result as running the head on those (bf16-rounded)
    features in f32 — i.e. the head itself adds no bf16 error. With the
    flag OFF the bf16 head visibly diverges from the f32 head."""
    cfg_off = tiny_cfg
    cfg_on = dataclasses.replace(cfg_off, rpn_head_f32=True)
    params = rpn_init(jax.random.PRNGKey(0), cfg_off)
    feats32 = _feats(cfg_off, np.random.default_rng(0))
    feats_bf = [jnp.asarray(f).astype(jnp.bfloat16) for f in feats32]
    feats_bf_as32 = [f.astype(jnp.float32) for f in feats_bf]

    cls_on, reg_on = rpn_apply(params, feats_bf, cfg_on)
    cls_ref, reg_ref = rpn_apply(params, feats_bf_as32, cfg_off)
    np.testing.assert_allclose(np.asarray(cls_on), np.asarray(cls_ref),
                               atol=0, rtol=0)
    np.testing.assert_allclose(np.asarray(reg_on), np.asarray(reg_ref),
                               atol=0, rtol=0)

    cls_off, _ = rpn_apply(params, feats_bf, cfg_off)
    # the bf16 head's objectness differs measurably from the f32 head's —
    # this is the knife-edge the flag removes
    assert float(jnp.abs(cls_off - cls_ref).max()) > 1e-4

    assert cls_on.dtype == jnp.float32 and reg_on.dtype == jnp.float32
    assert bool(jnp.isfinite(cls_on).all() and jnp.isfinite(reg_on).all())


def test_rpn_head_f32_training_stats(tiny_cfg):
    """Training mode: BN batch stats under the flag are computed from f32
    activations (finite, and the bn_updates dict is still populated)."""
    cfg_on = dataclasses.replace(tiny_cfg, rpn_head_f32=True)
    params = rpn_init(jax.random.PRNGKey(1), cfg_on)
    feats = [jnp.asarray(f).astype(jnp.bfloat16)
             for f in _feats(cfg_on, np.random.default_rng(1))]
    bn = {}
    cls, reg = rpn_apply(params, feats, cfg_on, training=True, bn_updates=bn)
    assert len(bn) == cfg_on.n_layers
    for stats in bn.values():
        for v in stats.values():
            assert bool(jnp.isfinite(v).all())
    assert bool(jnp.isfinite(cls).all() and jnp.isfinite(reg).all())
