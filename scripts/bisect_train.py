"""On-device stage bisection of the training step (perf work tracker).

Times cumulative pieces of the flagship train step on the real TPU at the
driver's operating point (B=8 by default, f32 images, bf16 trunk compute):

  rtt_probe        link RTT baseline (subtracted from every row)
  fwd_stage1       first-stage forward only (training=True)
  loss_value       both-stage losses, no gradient
  grad_stage1      value_and_grad of the stage-1 losses only
  grad_full        value_and_grad of the full two-stage loss
  train_step       + AdamW update, BN-stat merge (the driver's jitted step)
  targets_only     AnchorTargetLayer + proposal_target_layer on fixed rois

Each timing forces a scalar host readback (jax.block_until_ready does not
block through the axon tunnel; CLAUDE.md) and reports the median of N reps.

Usage: python scripts/bisect_train.py [--batch 8] [--reps 5] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--remat", action="store_true",
                   help="checkpoint the trunk (driver --remat)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step
    from birdsoundclassif_tpu.train.targets import (
        AnchorTargetLayer,
        proposal_target_layer,
    )
    from birdsoundclassif_tpu.train import losses as L

    cfg = NbmConfig()
    if args.remat:
        cfg.remat_backbone = True
    b, g = args.batch, cfg.max_gt_boxes

    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, cfg)
    train_step, _ = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    gt = jnp.asarray(
        [[120.0, 40.0, 420.0, 160.0], [500.0, 180.0, 820.0, 300.0]], jnp.float32
    )
    batch = {
        "img": jnp.asarray(
            rng.random((b, cfg.img_height, cfg.img_width), np.float32)
        ),
        "neg_img": jnp.asarray(
            rng.random((b, cfg.img_height, cfg.img_width), np.float32)
        ),
        "gt_boxes": jnp.tile(
            jnp.concatenate([gt, jnp.zeros((g - 2, 4), jnp.float32)])[None],
            (b, 1, 1),
        ),
        "gt_valid": jnp.tile(jnp.asarray([True, True] + [False] * (g - 2)), (b, 1)),
        "gt_labels": jnp.tile(jnp.asarray([3, 5] + [0] * (g - 2), jnp.int32), (b, 1)),
    }

    atl = AnchorTargetLayer(cfg)
    wd = L.weight_dict(cfg)

    def scalar(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves if l.ndim > 0)

    def loss_fn(params, batch, key, stage2: bool):
        from birdsoundclassif_tpu.models.nn import depthwise_taps_mode

        with depthwise_taps_mode():
            bn = {}
            out1 = NbmModel.forward_first_stage(
                params, batch["img"][..., None], cfg, training=True, bn_updates=bn
            )
            k_atl, k_ptl = jax.random.split(key)
            at = atl(k_atl, batch["gt_boxes"], batch["gt_valid"])
            losses = dict(
                L.first_stage_loss(out1.rpn_cls_scores, out1.rpn_bbox_reg, at)
            )
            if stage2:
                pt = proposal_target_layer(
                    k_ptl,
                    jax.lax.stop_gradient(out1.rois),
                    out1.roi_valid,
                    batch["gt_boxes"],
                    batch["gt_valid"],
                    batch["gt_labels"],
                    cfg,
                )
                bbox_reg, bbox_classes = NbmModel.forward_second_stage_train(
                    params, out1.fpn_out, pt.rois, cfg, bn
                )
                losses.update(L.second_stage_loss(bbox_reg, bbox_classes, pt, cfg))
            return sum(losses[k] * wd[k] for k in losses if k in wd)

    def rtt_probe(params, batch):
        return jnp.sum(batch["img"][0, 0, :8])

    def fwd_stage1(params, batch):
        from birdsoundclassif_tpu.models.nn import depthwise_taps_mode

        with depthwise_taps_mode():
            out1 = NbmModel.forward_first_stage(
                params, batch["img"][..., None], cfg, training=True, bn_updates={}
            )
        return scalar((out1.rpn_cls_scores, out1.rois))

    def loss_value(params, batch):
        return loss_fn(params, batch, key, stage2=True)

    def grad_stage1(params, batch):
        return scalar(jax.grad(lambda p: loss_fn(p, batch, key, stage2=False))(params))

    def grad_full(params, batch):
        return scalar(jax.grad(lambda p: loss_fn(p, batch, key, stage2=True))(params))

    def targets_only(params, batch):
        k_atl, k_ptl = jax.random.split(key)
        at = atl(k_atl, batch["gt_boxes"], batch["gt_valid"])
        rois = jnp.tile(
            jnp.asarray([[0.0, 0.0, 64.0, 64.0]], jnp.float32)[None],
            (b, cfg.post_nms_topN, 1),
        )
        pt = proposal_target_layer(
            k_ptl,
            rois,
            jnp.ones((b, cfg.post_nms_topN), bool),
            batch["gt_boxes"],
            batch["gt_valid"],
            batch["gt_labels"],
            cfg,
        )
        return scalar((at.labels, pt.rois, pt.labels))

    stages = [
        ("rtt_probe", rtt_probe),
        ("targets_only", targets_only),
        ("fwd_stage1", fwd_stage1),
        ("loss_value", loss_value),
        ("grad_stage1", grad_stage1),
        ("grad_full", grad_full),
    ]

    results = {}
    rtt = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        float(jf(state.params, batch))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jf(state.params, batch))
            ts.append((time.perf_counter() - t0) * 1000)
        med = float(np.median(ts))
        if name == "rtt_probe":
            rtt = med
            print(f"{name:14s} {med:8.1f} ms (link RTT baseline)")
            continue
        results[name] = med - rtt
        print(f"{name:14s} {med:8.1f} ms   (-rtt: {med - rtt:8.1f} ms)")

    # the real step (donated state: rebind each call; time via the losses
    # dict scalar readback, which is only ready when the step finishes)
    st = state
    new_st, losses = train_step(st, batch, key, negative_sample=False)
    float(losses["total"])
    st = new_st
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st, losses = train_step(st, batch, key, negative_sample=False)
        float(losses["total"])
        ts.append((time.perf_counter() - t0) * 1000)
    med = float(np.median(ts))
    results["train_step"] = med - rtt
    print(f"{'train_step':14s} {med:8.1f} ms   (-rtt: {med - rtt:8.1f} ms)")
    print({k: round(v, 1) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
