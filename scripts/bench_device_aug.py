"""Device-side augmentation wire-cost bench (data/device_aug.py).

Training through the narrow dev tunnel is transfer-bound (docs/BENCH.md:
~343 ms device step vs 0.3-1.4 s of per-step H2D). This bench times the
full per-step host path — batch cast + dispatch (which carries the H2D
transfer) + loss readback — for the three batch formats the driver
supports, on a real on-disk dataset:

  host_bf16  host-side augmentation, images ship as bfloat16
             (2 x b x 375 x 1024 x 2 B = 1.54 MB/img-pair at B=16 -> 12.3 MB)
  stream_u8  device augmentation, raw uint8 window bytes ship (6.1 MB)
  bank       device augmentation, uint8 pools resident in HBM; only int32
             indices + a dozen aug scalars ship (~0.3 KB)

Batches are pre-collated on the host so PNG decode stays out of the timed
loop — the measurement is wire + step, matching a loader that prefetches.

Usage: python scripts/bench_device_aug.py --data /tmp/nbm_hard_r3/dataset \
           [--batch 16] [--reps 8] [--modes host_bf16,stream_u8,bank]
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
    p.add_argument("--data", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--modes", default="host_bf16,stream_u8,bank")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.data.image_dataset import ImgDataset, collate_batch
    from birdsoundclassif_tpu.train.driver import _make_batch_caster
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    b = args.batch
    rows = []
    for mode in args.modes.split(","):
        cfg = NbmConfig()
        cfg.batch_size = b
        cfg.batch_transfer_dtype = "bfloat16"
        cfg.device_augment = mode != "host_bf16"
        cfg.aug_bank_mb = 0 if mode == "stream_u8" else 1024
        if mode == "bank_remat":
            # full-corpus banks (~0.7-1 GB resident) don't fit next to the
            # B=16 no-remat program on a 16 GB v5e; stage remat trades
            # recompute FLOPs for the HLO-temp headroom the banks need
            cfg.remat_backbone = True
            cfg.remat_granularity = "stages"
        cfg.set_derived()

        ds = ImgDataset(args.data, transform=True,
                        rng=np.random.default_rng(0))
        banks = None
        if cfg.device_augment:
            from birdsoundclassif_tpu.data.device_aug import build_banks

            banks = build_banks(ds, cfg)
        cast = _make_batch_caster(cfg)

        # pre-collate (decode off the timed path, like a prefetching loader)
        rng = np.random.default_rng(1)
        batches = [
            collate_batch([ds[int(i)] for i in
                           rng.integers(len(ds), size=b)], cfg.max_gt_boxes)
            for _ in range(args.reps + 1)
        ]
        wire = sum(v.nbytes for k, v in cast(batches[0]).items())

        key = jax.random.PRNGKey(0)
        state, tx = create_train_state(key, cfg)
        train_step, _ = make_train_step(cfg, tx)

        row = {"mode": mode, "batch": b, "wire_mb_per_step":
               round(wire / 1e6, 3)}
        t0 = time.time()
        state, losses = train_step(state, cast(batches[0]), key,
                                   negative_sample=False, banks=banks)
        first = {k: float(v) for k, v in losses.items()}
        assert all(np.isfinite(v) for v in first.values()), first
        row["compile_plus_first_s"] = round(time.time() - t0, 1)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            state, losses = train_step(state, cast(batches[i + 1]), key,
                                       negative_sample=False, banks=banks)
            float(losses["first_class_loss"])  # force host readback
            ts.append((time.perf_counter() - t0) * 1000)
        med = float(np.median(ts))
        row["ms_per_step"] = round(med, 1)
        row["img_per_s"] = round(b / (med / 1e3), 1)
        print(json.dumps(row), flush=True)
        rows.append(row)
        # release this mode's state/banks before the next compile
        del state, banks, batches
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
