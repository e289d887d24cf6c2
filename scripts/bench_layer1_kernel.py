"""On-chip A/B for the r3 stem + layer1 inference optimizations.

Cases (B=32 bf16, flagship shapes, interleaved-RTT methodology from
bisect_backbone.py layer1_variants):

  layer1_xla     the shipped XLA bottleneck loop on BN-folded params
  stem_unfused   init_conv (1->3) + conv1 7x7/2 (3->64) at 375x1024
  stem_folded    composed 7x7 1->64 + ones-map border term
                 (optimize.fold_init_conv semantics)

Historical note: this script also A/B'd a fused VMEM-resident Pallas
layer1 chain (ops/pallas_layer1.py). Measured on chip 2026-08-19:
layer1_xla 10.47 ms vs layer1_pallas 20.3 ms — the kernel LOST ~2x (the
dx-concat im2col's in-VMEM relayouts and the non-pipelined weight-
stationary chain cost more than the HBM round-trips it saved) and was
removed, same disposition as the Pallas STFT (docs/BENCH.md).

Usage: python scripts/bench_layer1_kernel.py [--batch 32] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models import nn as fnn
    from birdsoundclassif_tpu.models.backbone import (
        _bottleneck_apply,
        backbone_init,
        resnet_init,
    )
    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn, fold_init_conv

    B = args.batch
    rng = np.random.default_rng(0)

    # ---- layer1 cases (94x256x64 input, folded frozen BN) ----------------
    blocks = resnet_init(jax.random.PRNGKey(0), "resnet50")["layer1"]
    cfgr = NbmConfig()
    cfgr.set_derived()
    folded_blocks = fold_frozen_bn(
        {"backbone": {"body": {
            "conv1": {"w": jnp.zeros((7, 7, 3, 64))},
            "bn1": {"scale": jnp.ones(64), "bias": jnp.zeros(64),
                    "mean": jnp.zeros(64), "var": jnp.ones(64)},
            "layer1": blocks}}}, cfgr
    )["backbone"]["body"]["layer1"]

    x1 = jnp.asarray(
        rng.standard_normal((B, 94, 256, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def layer1_xla(x):
        out = x
        for bi in range(3):
            out = _bottleneck_apply(
                folded_blocks[str(bi)], out, 1, 1, 1,
                "frozen_batchnorm", False, None, "",
            )
        return jnp.sum(out.astype(jnp.float32))

    # ---- stem cases (375x1024x1 input) ------------------------------------
    cfg = NbmConfig()
    cfg.set_derived()
    bb = backbone_init(jax.random.PRNGKey(1), cfg)
    bb_folded = fold_init_conv(
        fold_frozen_bn({"backbone": bb}, cfg), cfg
    )["backbone"]

    x0 = jnp.asarray(
        rng.standard_normal((B, 375, 1024, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def stem_unfused(x):
        h = fnn.conv2d(bb["init_conv"], x)
        h = fnn.conv2d(bb["body"]["conv1"], h, stride=2, padding=3)
        h = fnn.relu(fnn.frozen_batchnorm(bb["body"]["bn1"], h))
        return jnp.sum(h.astype(jnp.float32))

    def stem_folded(x):
        body = bb_folded["body"]
        h = fnn.conv2d(body["conv1"], x, stride=2, padding=3)
        h = fnn.stem_corr_add(body["stem_corr"], h, x.shape, 2, 3)
        h = fnn.relu(fnn.frozen_batchnorm(body["bn1"], h))
        return jnp.sum(h.astype(jnp.float32))

    cases = {
        "layer1_xla": (layer1_xla, x1),
        "stem_unfused": (stem_unfused, x0),
        "stem_folded": (stem_folded, x0),
    }

    probe = jax.jit(lambda: jnp.float32(1.0) + 1.0)
    float(probe())
    meds, rtts = {}, []
    for name, (fn, arg) in cases.items():
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        float(jf(arg))
        print(f"{name}: warm {time.perf_counter() - t0:.1f}s", flush=True)
        deltas = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(probe())
            t1 = time.perf_counter()
            float(jf(arg))
            t2 = time.perf_counter()
            rtts.append((t1 - t0) * 1000)
            deltas.append((t2 - t1) * 1000 - (t1 - t0) * 1000)
        meds[name] = float(np.median(deltas))
        print(f"{name:14s} {meds[name]:8.2f} ms (-interleaved rtt)", flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "batch": B,
        "rtt_ms": round(float(np.median(rtts)), 1),
        **{k: round(v, 2) for k, v in meds.items()},
    }
    # analytic context
    gflop_l1 = 2 * B * 94 * 256 * (
        (64 * 64 + 9 * 64 * 64 + 64 * 256 + 64 * 256)
        + 2 * (256 * 64 + 9 * 64 * 64 + 64 * 256)
    ) / 1e9
    out["layer1_gflop"] = round(gflop_l1, 1)
    if meds["layer1_xla"] > 0:
        out["layer1_xla_tf_s"] = round(gflop_l1 / meds["layer1_xla"], 1)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
