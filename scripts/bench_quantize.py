"""On-chip A/B for the int8 FPN out-conv path (ops/qconv.py).

Three measurements, interleaved-RTT methodology (bisect_backbone.py):

  outconv_bf16   the five flagship-shape 3x3 384->256 out-convs, bf16
  outconv_int8   same shapes through qconv2d_3x3 (incl. the per-image
                 dynamic quantize + dequant epilogue)
  forward_bf16 / forward_int8
                 the full detector eval forward (B=32) with
                 cfg.quantize_fpn off/on

plus a detection-delta check: boxes/scores from both forwards on the
same synthetic windows (max |score delta|, box IoU of matched slots).

Usage: python scripts/bench_quantize.py [--batch 32] [--reps 7] [--cpu]
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

# flagship FPN level sizes at 375x1024 input (docs/BENCH.md roofline)
LEVELS = [(188, 512), (94, 256), (47, 128), (24, 64), (12, 32)]


def _iou_matrix(a, b):
    ax1, ay1, ax2, ay2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ix = np.maximum(
        0.0,
        np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]),
    )
    inter = ix * iy
    area_a = np.maximum(0.0, ax2 - ax1) * np.maximum(0.0, ay2 - ay1)
    area_b = np.maximum(0.0, bx2 - bx1) * np.maximum(0.0, by2 - by1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _match_stats(det_a, det_b, iou_thresh=0.5):
    """Greedy IoU matching of two fixed-slot Detections batches."""
    n_a = n_b = n_match = 0
    score_deltas, match_ious = [], []
    sa = np.asarray(det_a.scores, np.float32)
    sb = np.asarray(det_b.scores, np.float32)
    ba = np.asarray(det_a.boxes, np.float32)
    bb_ = np.asarray(det_b.boxes, np.float32)
    for i in range(sa.shape[0]):
        va, vb = sa[i] > 0, sb[i] > 0
        boxes_a, boxes_b = ba[i][va], bb_[i][vb]
        s_a, s_b = sa[i][va], sb[i][vb]
        n_a += len(boxes_a)
        n_b += len(boxes_b)
        if not len(boxes_a) or not len(boxes_b):
            continue
        iou = _iou_matrix(boxes_a, boxes_b)
        while True:
            j = np.unravel_index(np.argmax(iou), iou.shape)
            if iou[j] < iou_thresh:
                break
            n_match += 1
            match_ious.append(float(iou[j]))
            score_deltas.append(float(abs(s_a[j[0]] - s_b[j[1]])))
            iou[j[0], :] = -1
            iou[:, j[1]] = -1
    return {
        "det_n_bf16": n_a,
        "det_n_int8": n_b,
        "det_matched": n_match,
        "det_match_rate": round(n_match / max(n_a, n_b, 1), 4),
        "det_mean_match_iou": round(float(np.mean(match_ious)), 4)
        if match_ious else 1.0,
        "det_max_score_delta": round(float(np.max(score_deltas)), 5)
        if score_deltas else 0.0,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip_forward", action="store_true",
                   help="only the isolated out-conv block")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models import nn as fnn
    from birdsoundclassif_tpu.ops.qconv import qconv2d_3x3, quantize_conv_params

    B = args.batch
    rng = np.random.default_rng(0)
    cin, cout = 384, 256

    conv = {
        "w": jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32) * 0.03,
        "b": jnp.asarray(rng.standard_normal(cout), jnp.float32) * 0.1,
    }
    qp = quantize_conv_params(conv)
    xs = [
        jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.float32).astype(
            jnp.bfloat16
        )
        for h, w in LEVELS
    ]

    def outconv_bf16(xs):
        return sum(
            jnp.sum(fnn.conv2d(conv, x, padding=1).astype(jnp.float32)) for x in xs
        )

    def outconv_int8(xs):
        return sum(jnp.sum(qconv2d_3x3(qp, x).astype(jnp.float32)) for x in xs)

    cases = {"outconv_bf16": (outconv_bf16, xs), "outconv_int8": (outconv_int8, xs)}

    fwd_stats = {}
    if not args.skip_forward:
        from birdsoundclassif_tpu.models.detector import NbmModel
        from birdsoundclassif_tpu.models.optimize import fold_inference

        cfg = NbmConfig()
        cfg.num_classes = 20
        cfg.set_derived()
        raw = NbmModel.init(jax.random.PRNGKey(0), cfg)
        params_bf16 = fold_inference(raw, cfg)
        cfg_q = NbmConfig()
        cfg_q.num_classes = 20
        cfg_q.quantize_fpn = True
        cfg_q.set_derived()
        params_int8 = fold_inference(raw, cfg_q)
        wins = jnp.asarray(
            rng.standard_normal((B, 375, 1024, 1)), jnp.float32
        )

        def fwd(params, cfg_, x):
            det = NbmModel.forward(params, x, cfg_, 0.3, 0.003)
            return (jnp.sum(det.boxes.astype(jnp.float32))
                    + jnp.sum(det.scores.astype(jnp.float32)))

        cases["forward_bf16"] = (lambda x: fwd(params_bf16, cfg, x), wins)
        cases["forward_int8"] = (lambda x: fwd(params_int8, cfg_q, x), wins)

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

    if not args.skip_forward:
        # detection delta on one batch: match the two detection SETS by
        # IoU (slot indices churn under NMS ties, so per-slot diffs are
        # meaningless), report match rate + score agreement on matches.
        # Jitted (an eager detector forward is thousands of per-op RTTs
        # through the axon tunnel, minutes per call) and run AFTER the
        # timing loop so a timeout still leaves the timing numbers.
        det_a = jax.jit(
            lambda x: NbmModel.forward(params_bf16, x, cfg, 0.3, 0.003)
        )(wins[:4])
        det_b = jax.jit(
            lambda x: NbmModel.forward(params_int8, x, cfg_q, 0.3, 0.003)
        )(wins[:4])
        fwd_stats = _match_stats(det_a, det_b)
        # human-readable progress only — the single JSON result line below
        # already merges these keys (repo convention: one JSON line/script)
        print("det match: " + ", ".join(f"{k}={v}" for k, v in fwd_stats.items()),
              flush=True)

    gflop = sum(2 * B * h * w * 9 * cin * cout for h, w in LEVELS) / 1e9
    out = {
        "device": str(jax.devices()[0]),
        "batch": B,
        "rtt_ms": round(float(np.median(rtts)), 1),
        "outconv_gflop": round(gflop, 1),
        **{k: round(v, 2) for k, v in meds.items()},
        **fwd_stats,
    }
    for k in ("outconv_bf16", "outconv_int8"):
        if meds.get(k, 0) > 0:
            out[k + "_tf_s"] = round(gflop / meds[k], 1)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
