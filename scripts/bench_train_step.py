"""Training memory-wall bench (VERDICT r2 next #5).

Times the driver's real jitted train step (donated TrainState, AdamW,
BN-stat merge) at a given batch size and rematerialization mode:

  off     no jax.checkpoint
  trunk   one checkpoint around backbone+attn+FPN (r2 behavior)
  blocks  one checkpoint per resnet bottleneck + attn + FPN (r3)

Reports median ms/step (host-readback forced; the axon tunnel does not
honor block_until_ready — CLAUDE.md), img/s, and the device's peak HBM
after the run. OOM during compile/first-step is caught and reported as a
row, because "does it fit" is the measurement.

Usage: python scripts/bench_train_step.py --batch 32 --remat blocks [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--remat", choices=("off", "trunk", "blocks", "stages"),
                   default="off")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--accum", type=int, default=1,
                   help="grad_accum_steps (batch = optimizer batch)")
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
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    cfg = NbmConfig()
    cfg.batch_size = args.batch
    cfg.grad_accum_steps = args.accum
    cfg.remat_backbone = args.remat != "off"
    if args.remat in ("blocks", "stages"):
        cfg.remat_granularity = args.remat
    else:
        cfg.remat_granularity = "trunk"
    cfg.set_derived()

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

    row = {"batch": b, "remat": args.remat, "accum": args.accum}
    try:
        t0 = time.time()
        state, losses = train_step(state, batch, key, negative_sample=False)
        first = {k: float(v) for k, v in losses.items()}
        row["compile_plus_first_s"] = round(time.time() - t0, 1)
        assert all(np.isfinite(v) for v in first.values()), first
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, losses = train_step(state, batch, key, negative_sample=False)
            float(losses["first_class_loss"])  # force host readback
            ts.append((time.perf_counter() - t0) * 1000)
        med = float(np.median(ts))
        row["ms_per_step"] = round(med, 1)
        row["img_per_s"] = round(b / (med / 1e3), 1)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            row["peak_hbm_gib"] = round(peak / 2**30, 2)
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED -> report OOM
        msg = str(e)
        row["oom"] = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
        row["error"] = msg.splitlines()[0][:300]
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
