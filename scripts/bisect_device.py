"""On-device stage bisection of the flagship forward (perf work tracker).

Times cumulative stage prefixes of the detector on the real TPU at B=32,
bf16, BN-folded — the bench operating point. Each timing forces a scalar
host readback (jax.block_until_ready does not block through the axon
tunnel; CLAUDE.md) and reports the median of N reps with the measured
RTT of a trivial op subtracted.

Usage: python scripts/bisect_device.py [--batch 32] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.backbone import backbone_apply
    from birdsoundclassif_tpu.models.attention import sa_pyramid_apply
    from birdsoundclassif_tpu.models import fpn as fpn_mod
    from birdsoundclassif_tpu.models import nn as fnn
    from birdsoundclassif_tpu.models.rpn import rpn_apply, proposal_layer
    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn
    from birdsoundclassif_tpu.ops.image import resize_bilinear_align_corners

    cfg = NbmConfig()
    params = fold_frozen_bn(NbmModel.init(jax.random.PRNGKey(0), cfg), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random(
            (args.batch, cfg.img_height, cfg.img_width, 1), np.float32
        )
    )

    def scalar(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.ndim > 0)

    cdt = jnp.dtype(cfg.compute_dtype)

    def stage_backbone(p, x):
        feats, _ = backbone_apply(p["backbone"], x.astype(cdt), cfg)
        return scalar(feats)

    def stage_attn(p, x):
        feats, _ = backbone_apply(p["backbone"], x.astype(cdt), cfg)
        feats = sa_pyramid_apply(p["attn"], feats, cfg.pyramid_top_n_attn)
        return scalar(feats)

    def _trunk(p, x):
        feats, _ = backbone_apply(p["backbone"], x.astype(cdt), cfg)
        feats = sa_pyramid_apply(p["attn"], feats, cfg.pyramid_top_n_attn)
        return fpn_mod.build_fpn_apply(p["fpn"], cfg, feats, False, None)

    def stage_fpn(p, x):
        return scalar(_trunk(p, x))

    # FPN sub-stages
    def _attn_feats(p, x):
        feats, _ = backbone_apply(p["backbone"], x.astype(cdt), cfg)
        return sa_pyramid_apply(p["attn"], feats, cfg.pyramid_top_n_attn)

    def stage_fpn_ptwise(p, x):
        feats = _attn_feats(p, x)
        pt = [fnn.conv2d(p["fpn"]["pt_wise"][str(i)], fm) for i, fm in enumerate(feats)]
        return scalar(pt)

    def stage_fpn_merge(p, x):
        feats = _attn_feats(p, x)
        pt = [fnn.conv2d(p["fpn"]["pt_wise"][str(i)], fm) for i, fm in enumerate(feats)]
        out = pt.pop(-1)
        acc = [out]
        while pt:
            p_out = pt.pop(-1)
            out = resize_bilinear_align_corners(out, p_out.shape[1], p_out.shape[2]) + p_out
            acc.append(out)
        return scalar(acc)

    def stage_rpn(p, x):
        fpn_out = _trunk(p, x)
        cls, reg = rpn_apply(p["head"]["rpn"], fpn_out, cfg)
        return scalar((cls, reg))

    def stage_proposal(p, x):
        fpn_out = _trunk(p, x)
        cls, reg = rpn_apply(p["head"]["rpn"], fpn_out, cfg)
        props = proposal_layer(cls, reg, cfg, training=False)
        return scalar((props.rois, props.scores))

    def stage_full(p, x):
        det = NbmModel.forward(p, x, cfg, nms_thresh=0.3, min_score=0.2)
        return scalar((det.boxes, det.scores))

    def rtt_probe(p, x):
        return jnp.sum(x[0, 0, :8, 0])

    stages = [
        ("rtt_probe", rtt_probe),
        ("backbone", stage_backbone),
        ("+attn", stage_attn),
        ("fpn:ptwise_only", stage_fpn_ptwise),
        ("fpn:+resize_add", stage_fpn_merge),
        ("+fpn(full)", stage_fpn),
        ("+rpn", stage_rpn),
        ("+proposal", stage_proposal),
        ("full_forward", stage_full),
    ]

    results = {}
    rtt = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        v = float(jf(params, x))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jf(params, x))
            ts.append((time.perf_counter() - t0) * 1000)
        med = float(np.median(ts))
        if name == "rtt_probe":
            rtt = med
            print(f"{name:18s} {med:8.1f} ms (link RTT baseline)")
            continue
        results[name] = med - rtt
        print(f"{name:18s} {med:8.1f} ms   (-rtt: {med - rtt:8.1f} ms)")
    print({k: round(v, 1) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
