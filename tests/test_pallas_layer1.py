"""Fused layer1 Pallas chain vs the plain XLA bottleneck loop.

Interpret mode (CPU) pins the kernel's semantics: BN folding at trace
time, the partial-im2col 3x3, halo consumption across the three
bottlenecks, and the image-border h1 masking (the reference zero-pads each
3x3's *input*, so border halo columns must not leak relu(bias) — see
ops/pallas_layer1.py _bottleneck).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.models.backbone import (
    _bottleneck_apply,
    backbone_apply,
    backbone_init,
    resnet_init,
)
from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.ops.pallas_layer1 import (
    fused_layer1,
    pick_tile_w,
    supports,
)


def _layer1(seed=0, randomize_bn=True):
    blocks = resnet_init(jax.random.PRNGKey(seed), "resnet50")["layer1"]
    if randomize_bn:
        key = [jax.random.PRNGKey(seed + 1)]

        def walk(d):
            for v in d.values():
                if isinstance(v, dict):
                    if set(v) == {"scale", "bias", "mean", "var"}:
                        key[0], k1, k2, k3 = jax.random.split(key[0], 4)
                        ch = v["scale"].shape
                        v["scale"] = 0.8 + 0.4 * jax.random.uniform(k1, ch)
                        v["bias"] = 0.1 * jax.random.normal(k2, ch)
                        v["mean"] = 0.1 * jax.random.normal(k3, ch)
                    else:
                        walk(v)

        walk(blocks)
    return blocks


def _reference(blocks, x):
    out = x
    for bi in range(3):
        out = _bottleneck_apply(
            blocks[str(bi)], out, 1, 1, 1, "frozen_batchnorm", False, None, ""
        )
    return out


@pytest.mark.parametrize(
    "shape",
    [
        (2, 10, 32, 64),   # single tile: both W borders in one program
        (1, 9, 64, 64),    # two tiles: interior tile boundary
        (2, 12, 96, 64),   # three tiles
    ],
)
def test_fused_matches_block_loop_f32(shape):
    blocks = _layer1()
    x = jax.random.uniform(jax.random.PRNGKey(2), shape, jnp.float32)
    want = np.asarray(_reference(blocks, x))
    got = np.asarray(fused_layer1(x, blocks, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5 * np.abs(want).max())


def test_fused_matches_block_loop_bf16():
    """bf16 storage, f32 accumulation — same numerics contract as the XLA
    path; tolerance is bf16 resolution on the activation scale."""
    blocks = _layer1()
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (2, 10, 32, 64), jnp.float32
    ).astype(jnp.bfloat16)
    want = np.asarray(_reference(blocks, x), np.float32)
    got = np.asarray(fused_layer1(x, blocks, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2 * np.abs(want).max())


def test_supports_gates():
    blocks = _layer1()
    assert supports(blocks, 1, 256)
    assert not supports(blocks, 32, 256)        # grouped 3x3 (resnext)
    assert not supports(blocks, 1, 7)           # no tile divides W
    assert not supports({"0": blocks["0"]}, 1, 256)  # wrong block count
    assert pick_tile_w(256) == 32


def test_backbone_apply_flag_cpu_path_identical():
    """With pallas_layer1=True on a CPU lowering, platform_dependent must
    take the XLA branch and reproduce the flag-off forward bitwise."""
    cfg = NbmConfig()
    cfg.set_derived()
    params = backbone_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 40, 64, 1))
    want, _ = backbone_apply(params, x, cfg)
    cfg2 = NbmConfig()
    cfg2.pallas_layer1 = True
    cfg2.set_derived()
    got, _ = backbone_apply(params, x, cfg2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fused_on_folded_tree_is_idempotent():
    """fold_frozen_bn rewrites BNs to identities; the kernel's trace-time
    fold must be a no-op on them (same output as on the raw tree)."""
    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn

    blocks = _layer1()
    cfg = NbmConfig()
    cfg.set_derived()
    folded = fold_frozen_bn(
        {"backbone": {"body": {"layer1": blocks, "conv1": {"w": jnp.zeros((7, 7, 3, 64))}, "bn1": {
            "scale": jnp.ones(64), "bias": jnp.zeros(64),
            "mean": jnp.zeros(64), "var": jnp.ones(64)}}}}, cfg
    )["backbone"]["body"]["layer1"]
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 8, 32, 64), jnp.float32)
    a = np.asarray(fused_layer1(x, blocks, interpret=True))
    b = np.asarray(fused_layer1(x, folded, interpret=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5 * np.abs(a).max())
