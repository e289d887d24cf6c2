"""Backbone-internal bisection (VERDICT r2 next #7).

Times cumulative prefixes of the resnet50 pyramid — init_conv, stem
(conv1+bn+relu), maxpool, layer1..layer4 — on the real TPU at the bench
operating point (B=32, bf16 compute, BN-folded), RTT-subtracted, and
derives per-stage time by differencing. Each stage's analytic conv FLOPs
give the achieved TFLOP/s so the 26 ms / ~22% MXU plateau (docs/BENCH.md
r2 stage bisection) can be attributed to specific stages.

Caveat: differencing cumulative prefixes attributes XLA's cross-stage
fusion to the later stage; per-stage numbers are approximate but the
ranking is what matters.

Usage: python scripts/bisect_backbone.py [--batch 32] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_flops(h, w, kh, kw, cin, cout, stride, groups=1):
    ho, wo = -(-h // stride), -(-w // stride)
    return 2 * ho * wo * kh * kw * (cin // groups) * cout, ho, wo


def resnet50_stage_flops(h, w, cin=64):
    """Analytic conv FLOPs per image for each timed region (f32/bf16
    agnostic). Returns {stage: flops} with the stem on the init_conv'd
    (h, w, cin=1->64 via init_conv is counted separately)."""
    out = {}
    # init_conv 1->64 ch 1x1 is part of the Joiner, counted by caller
    f, h2, w2 = conv_flops(h, w, 7, 7, 3, 64, 2)  # conv1: 3->64 (init_conv is 1->3)
    out["stem(conv1)"] = f
    hp, wp = -(-h2 // 2), -(-w2 // 2)  # maxpool /2
    spec = [(3, 64, 256, 1), (4, 128, 512, 2), (6, 256, 1024, 2), (3, 512, 2048, 2)]
    ch_in, hh, ww = 64, hp, wp
    for i, (blocks, planes, ch_out, stride) in enumerate(spec):
        total = 0
        for b in range(blocks):
            s = stride if b == 0 else 1
            c_in = ch_in if b == 0 else ch_out
            f1, _, _ = conv_flops(hh, ww, 1, 1, c_in, planes, 1)
            f2, h3, w3 = conv_flops(hh, ww, 3, 3, planes, planes, s)
            f3, _, _ = conv_flops(h3, w3, 1, 1, planes, ch_out, 1)
            total += f1 + f2 + f3
            if b == 0:
                fd, _, _ = conv_flops(hh, ww, 1, 1, c_in, ch_out, s)
                total += fd
            hh, ww = h3, w3
        out[f"layer{i + 1}"] = total
        ch_in = ch_out
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--layer1", action="store_true",
                   help="micro-bench layer1 variants (channel padding)")
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    if args.layer1:
        return layer1_variants(args)

    import jax.numpy as jnp
    import numpy as np

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models import nn as fnn
    from birdsoundclassif_tpu.models.backbone import RESNET_SPECS, _bottleneck_apply
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn

    cfg = NbmConfig()
    assert cfg.backbone == "resnet50"
    params = fold_frozen_bn(NbmModel.init(jax.random.PRNGKey(0), cfg), cfg)
    bb = params["backbone"]
    x = jnp.asarray(
        np.random.default_rng(0).random(
            (args.batch, cfg.img_height, cfg.img_width, 1), np.float32
        )
    )
    cdt = jnp.dtype(cfg.compute_dtype)
    spec = RESNET_SPECS["resnet50"]
    nk = cfg.norm_layer_backbone

    def run_layers(p, x, n_stages):
        p = p["backbone"]
        body = p["body"]
        out = fnn.conv2d(p["init_conv"], x.astype(cdt))
        out = fnn.conv2d(body["conv1"], out, stride=2, padding=3)
        from birdsoundclassif_tpu.models.backbone import _norm

        out = fnn.relu(_norm(body["bn1"], out, nk, False, None, ""))
        if n_stages < 0:
            return out
        out = fnn.max_pool2d(out, 3, 2, 1)
        for stage in range(n_stages):
            blocks = body[f"layer{stage + 1}"]
            stage_stride = 1 if stage == 0 else 2
            for b in range(len(blocks)):
                stride = stage_stride if b == 0 else 1
                out = _bottleneck_apply(
                    blocks[str(b)], out, stride, 1, spec["groups"], nk,
                    False, None, "",
                )
        return out

    def mk(n_stages):
        def f(p, x):
            return jnp.sum(run_layers(p, x, n_stages).astype(jnp.float32))
        return f

    stages = [
        ("rtt_probe", lambda p, x: jnp.sum(x[0, 0, :8, 0])),
        ("stem(conv1)", mk(-1)),
        ("+maxpool", mk(0)),
        ("+layer1", mk(1)),
        ("+layer2", mk(2)),
        ("+layer3", mk(3)),
        ("+layer4", mk(4)),
    ]

    meds = {}
    rtt = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        float(jf(params, x))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jf(params, x))
            ts.append((time.perf_counter() - t0) * 1000)
        med = float(np.median(ts))
        if name == "rtt_probe":
            rtt = med
            print(f"{name:14s} {med:8.1f} ms (link RTT baseline)", flush=True)
            continue
        meds[name] = med - rtt
        print(f"{name:14s} {med:8.1f} ms   (-rtt: {med - rtt:8.1f} ms)", flush=True)

    # per-stage deltas + analytic FLOPs -> achieved TFLOP/s
    flops = resnet50_stage_flops(cfg.img_height, cfg.img_width)
    order = ["stem(conv1)", "+maxpool", "+layer1", "+layer2", "+layer3", "+layer4"]
    prev = 0.0
    table = {}
    for name in order:
        dt = meds[name] - prev
        prev = meds[name]
        key = name.lstrip("+")
        fl = flops.get(key if key != "maxpool" else "", 0) * args.batch
        tflops = fl / (dt * 1e-3) / 1e12 if dt > 0.3 and fl else None
        table[name] = {"cum_ms": round(meds[name], 1), "delta_ms": round(dt, 1),
                       "gflops": round(fl / 1e9, 1) if fl else 0,
                       "tflops_per_s": round(tflops, 1) if tflops else None}
        print(f"{name:14s} delta {dt:7.1f} ms  {table[name]['gflops']:8.1f} GF"
              f"  -> {table[name]['tflops_per_s']} TF/s", flush=True)
    print(json.dumps({"batch": args.batch, "rtt_ms": round(rtt, 1),
                      "stages": table}), flush=True)
    return 0


def layer1_variants(args) -> int:
    """One measured optimization attempt on the dominant stage: layer1 at
    B=32 runs ~33 TF/s (17% of bf16 peak) because its 64-channel convs
    half-fill the 128-wide MXU tiles. Variants:

      natural    3 bottlenecks, planes=64 (as shipped)
      padded128  planes zero-padded to 128 (identical math after slicing;
                 2x FLOPs on the 1x1s, 4x on the 3x3) — tests whether tile
                 occupancy or raw FLOPs bound the stage
      f32        natural in float32 — is bf16 even engaged at 64 ch?
      hbm_probe  copy of the stage's activation bytes — bandwidth roofline
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = args.batch
    h, w = 94, 256
    rng = np.random.default_rng(0)

    def W(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.05)

    def make_params(planes):
        ps = []
        for b in range(3):
            cin = 64 if b == 0 else 256
            ps.append({
                "c1": W(1, 1, cin, planes), "c2": W(3, 3, planes, planes),
                "c3": W(1, 1, planes, 256),
                "down": W(1, 1, cin, 256) if b == 0 else None,
            })
        return ps

    def apply(ps, x, dtype):
        x = x.astype(dtype)
        for p in ps:
            idn = x
            y = jax.nn.relu(jax.lax.conv_general_dilated(
                x, p["c1"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype))
            y = jax.nn.relu(jax.lax.conv_general_dilated(
                y, p["c2"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype))
            y = jax.lax.conv_general_dilated(
                y, p["c3"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
            if p["down"] is not None:
                idn = jax.lax.conv_general_dilated(
                    x, p["down"].astype(dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(dtype)
            x = jax.nn.relu(y + idn)
        return x

    x_in = jnp.asarray(rng.standard_normal((B, h, w, 64)).astype(np.float32))
    p64, p128 = make_params(64), make_params(128)

    # hbm probe: a pure read-bandwidth roofline. The buffer is 8 stage-sized
    # 256-channel activations (8, B, h, w, 256) bf16 ≈ 3.15 GB at B=32 —
    # far beyond VMEM, so the sum is one full HBM read with negligible
    # compute, measurable above the ~25-30 ms tunnel RTT.
    # It MUST be a jit *argument*: an argument-free jit whose operands are
    # all constants gets constant-folded by XLA at compile time (a first
    # version using a captured buffer + fori_loop of `y * 1.0001` measured
    # exactly the RTT — and `* 1.0001` is the identity in bf16 anyway,
    # bf16 eps ≈ 0.0039).
    big = jax.jit(lambda: jnp.full((8, B, h, w, 256), 1.0, jnp.bfloat16))()
    hbm_iters = 5
    hbm_bytes = hbm_iters * big.size * 2

    def hbm_probe(y):
        # each iteration multiplies by the loop counter, so the body is NOT
        # loop-invariant and every iteration re-reads the full 3.15 GB from
        # HBM (it cannot fit in VMEM): ~15.8 GB of read traffic
        def body(i, s):
            return s + jnp.sum(y.astype(jnp.float32) * i.astype(jnp.float32))
        return jax.lax.fori_loop(0, hbm_iters, body, jnp.float32(0.0))

    cases = {
        "natural_bf16": lambda: jnp.sum(apply(p64, x_in, jnp.bfloat16).astype(jnp.float32)),
        "padded128_bf16": lambda: jnp.sum(apply(p128, x_in, jnp.bfloat16).astype(jnp.float32)),
        "natural_f32": lambda: jnp.sum(apply(p64, x_in, jnp.float32)),
        "hbm_probe": hbm_probe,
    }
    import json

    # tunnel weather drifts several ms over a run (observed: the RTT probe
    # medianed 24.4 then 28.9 ms in back-to-back runs while the raw case
    # times moved <0.4 ms) — so the RTT probe is interleaved per-rep and
    # each rep records the *delta*, cancelling slow drift
    probe = jax.jit(lambda: jnp.float32(1.0) + 1.0)
    float(probe())
    meds, rtts = {}, []
    for name, fn in cases.items():
        jf = jax.jit(fn)
        fn_args = (big,) if name == "hbm_probe" else ()
        float(jf(*fn_args))
        deltas = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(probe())
            t1 = time.perf_counter()
            float(jf(*fn_args))
            t2 = time.perf_counter()
            rtts.append((t1 - t0) * 1000)
            deltas.append((t2 - t1) * 1000 - (t1 - t0) * 1000)
        meds[name] = float(np.median(deltas))
        print(f"{name:16s} {meds[name]:8.1f} ms (-interleaved rtt)", flush=True)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt:.1f} ms", flush=True)
    out = {"batch": B, "rtt_ms": round(rtt, 1),
           **{k: round(v, 2) for k, v in meds.items()}}
    hbm_ms = meds["hbm_probe"]
    if hbm_ms > 0.3:
        out["hbm_read_gb_per_s"] = round(hbm_bytes / (hbm_ms * 1e-3) / 1e9, 1)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
