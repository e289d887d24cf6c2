"""Int8 quantized FPN out-conv path (ops/qconv.py, opt-in cfg.quantize_fpn).

Error-bound and dispatch tests run on the CPU backend; the on-chip speed
A/B lives in scripts/bench_quantize.py with results in docs/BENCH.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models import nn as fnn
from birdsoundclassif_tpu.ops.qconv import (
    is_quantized, qconv2d_3x3, quantize_conv_params,
)


@pytest.fixture
def conv_params(rng):
    w = rng.standard_normal((3, 3, 64, 48)).astype(np.float32) * 0.05
    b = rng.standard_normal(48).astype(np.float32) * 0.1
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def test_weight_quantization_error_bound(conv_params):
    q = quantize_conv_params(conv_params)
    assert q["wq"].dtype == jnp.int8 and is_quantized(q)
    deq = np.asarray(q["wq"], np.float32) * np.asarray(q["sw"])
    w = np.asarray(conv_params["w"])
    # symmetric round-to-nearest: error <= s_w/2 per element
    bound = np.asarray(q["sw"]) / 2 + 1e-8
    assert (np.abs(deq - w) <= bound[None, None, None, :] + 1e-7).all()


def test_zero_channel_weight_is_stable(conv_params):
    p = {"w": conv_params["w"].at[..., 0].set(0.0)}
    q = quantize_conv_params(p)
    assert np.isfinite(np.asarray(q["sw"])).all()
    assert (np.asarray(q["wq"])[..., 0] == 0).all()


def test_qconv_matches_f32_conv_within_quant_error(conv_params, rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 20, 64)).astype(np.float32))
    ref = fnn.conv2d(conv_params, x, padding=1)
    got = qconv2d_3x3(quantize_conv_params(conv_params), x)
    ref, got = np.asarray(ref), np.asarray(got)
    # two int8 operands: relative error ~1% of the output dynamic range
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)
    # and the approximation is tight in aggregate, not just bounded
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.9995


def test_qconv_zero_input_returns_bias(conv_params):
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)
    out = np.asarray(qconv2d_3x3(quantize_conv_params(conv_params), x))
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(conv_params["b"]), out.shape), atol=1e-6
    )


def test_qconv_per_image_scale_is_batch_independent(conv_params, rng):
    """A window's output must not depend on its batch neighbours (merge
    determinism): per-IMAGE scales, not per-batch."""
    a = rng.standard_normal((1, 10, 16, 64)).astype(np.float32)
    hot = 50.0 * rng.standard_normal((1, 10, 16, 64)).astype(np.float32)
    q = quantize_conv_params(conv_params)
    solo = np.asarray(qconv2d_3x3(q, jnp.asarray(a)))
    batched = np.asarray(
        qconv2d_3x3(q, jnp.concatenate([jnp.asarray(a), jnp.asarray(hot)]))
    )[:1]
    np.testing.assert_array_equal(solo, batched)


def test_qconv_bf16_activation_dtype_roundtrip(conv_params, rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.bfloat16)
    out = qconv2d_3x3(quantize_conv_params(conv_params), x)
    assert out.dtype == jnp.bfloat16


class TestFoldIntegration:
    def test_fold_inference_quantizes_out_convs_opt_in(self, rng):
        from birdsoundclassif_tpu.models.detector import NbmModel
        from birdsoundclassif_tpu.models.optimize import fold_inference

        cfg = NbmConfig()
        cfg.backbone = "resnet50"
        cfg.num_classes = 3
        cfg.set_derived()
        params = NbmModel.init(jax.random.PRNGKey(0), cfg)

        plain = fold_inference(params, cfg)
        assert "wq" not in plain["fpn"]["out_convs"]["0"]

        cfg.quantize_fpn = True
        q = fold_inference(params, cfg)
        for k, p in q["fpn"]["out_convs"].items():
            assert is_quantized(p), k
        # everything else untouched
        assert not is_quantized(q["fpn"]["pt_wise"]["0"])

    def test_quantized_fpn_apply_close_to_f32(self, rng):
        from birdsoundclassif_tpu.models.fpn import fpn_apply, fpn_init
        from birdsoundclassif_tpu.models.optimize import quantize_fpn_out

        cfg = NbmConfig()
        cfg.quantize_fpn = True
        key = jax.random.PRNGKey(1)
        channels = [32, 64]
        p = fpn_init(key, channels, 48, 40)
        feats = [
            jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32),
            jnp.asarray(rng.standard_normal((2, 8, 12, 64)), jnp.float32),
        ]
        ref = fpn_apply(p, feats)
        qp = quantize_fpn_out({"fpn": p}, cfg)["fpn"]
        got = fpn_apply(qp, feats)
        for r, g in zip(ref, got):
            r, g = np.asarray(r), np.asarray(g)
            np.testing.assert_allclose(g, r, atol=0.02 * np.abs(r).max())
