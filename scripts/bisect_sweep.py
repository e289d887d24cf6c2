"""Attribute the e2e sweep's per-file wall time (r3).

The loaded 8x600s bench runs at ~443x RT = ~1.35 s/file, while its two
big overlapped terms are each ~1.0 s/file (detector program ~0.98 s,
wire-codec H2D ~0.93 s at 46 MB/s). This probe times every phase of the
production three-way overlap (infer/pipeline.stream_detections) to find
where the extra ~0.35 s/file of non-overlapped wall time lives:

  prefetch thread: host synth/decode, wirecodec encode, frontend.process
                   (payload H2D + decode/STFT dispatch)
  main thread:     future wait, detector dispatch, deferred packed
                   readback, host dict assembly

plus two isolation baselines (sequential, forced readback per step):
  A. detector-only per-file program wall (fe_res staged once)
  B. transfer-only (device_put of one file's packed payload + sync)

Usage: python scripts/bisect_sweep.py [--files 8] [--seconds 600]
       [--reps 1] [--prefetch_workers 1]
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
    p.add_argument("--files", type=int, default=8)
    p.add_argument("--seconds", type=float, default=600.0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--min_score", type=float, default=0.003)
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--prefetch_workers", type=int, default=1,
                   help="worker threads in the FilePrefetcher (1 = "
                        "production; 2 overlaps file i+2's encode with "
                        "file i+1's transfer)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.audio import wirecodec
    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.infer import pipeline
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn

    cfg = NbmConfig()
    params = jax.jit(lambda key: fold_frozen_bn(NbmModel.init(key, cfg), cfg))(
        jax.random.PRNGKey(0))

    sr = cfg.frontend.sample_rate
    rng = np.random.default_rng(0)
    t = np.arange(int(args.seconds * sr)) / sr

    def make_file(i):
        f0 = 1500.0 + 700.0 * i
        sig = (0.2 * np.sin(2 * np.pi * f0 * t)
               * (np.sin(2 * np.pi * 0.7 * t + i) > 0)
               + 0.01 * rng.standard_normal(t.shape))
        return (np.clip(sig, -1, 1) * 32767).astype(np.int16)

    files = [make_file(i) for i in range(args.files)]
    frontend = SpectrogramFrontend(cfg.frontend)

    # ---- instrumented phases --------------------------------------------
    rec = {"encode_s": [], "fe_rest_s": [], "fe_total_s": [],
           "fut_wait_s": [], "dispatch_s": [], "readback_s": [],
           "assemble_s": [], "file_wall_s": []}

    import concurrent.futures as cf

    def prefetch_work(x):
        t0 = time.perf_counter()
        pa = wirecodec.encode(x)
        t1 = time.perf_counter()
        fe = frontend.process(pa)
        t2 = time.perf_counter()
        rec["encode_s"].append(t1 - t0)
        rec["fe_rest_s"].append(t2 - t1)
        rec["fe_total_s"].append(t2 - t0)
        return fe

    def instrumented_sweep():
        pool = cf.ThreadPoolExecutor(args.prefetch_workers)
        try:
            futs = [pool.submit(prefetch_work, files[0])]
            pending = None
            n_det = 0
            t_sweep0 = time.perf_counter()
            t_prev = t_sweep0
            for i in range(len(files)):
                t0 = time.perf_counter()
                fe_res = futs[i].result()
                t1 = time.perf_counter()
                futs[i] = None
                if i + 1 < len(files):
                    futs.append(pool.submit(prefetch_work, files[i + 1]))
                packed = pipeline.detect_file_packed(
                    params, cfg, fe_res, args.min_score, args.batch)
                t2 = time.perf_counter()
                if pending is not None:
                    t3 = time.perf_counter()
                    arr = np.asarray(pending)
                    t4 = time.perf_counter()
                    out = pipeline.packed_to_class_dict(arr, cfg)
                    n_det += sum(len(v["scores"]) for v in out.values())
                    t5 = time.perf_counter()
                    rec["readback_s"].append(t4 - t3)
                    rec["assemble_s"].append(t5 - t4)
                pending = packed
                rec["fut_wait_s"].append(t1 - t0)
                rec["dispatch_s"].append(t2 - t1)
                now = time.perf_counter()
                rec["file_wall_s"].append(now - t_prev)
                t_prev = now
            t3 = time.perf_counter()
            arr = np.asarray(pending)
            t4 = time.perf_counter()
            out = pipeline.packed_to_class_dict(arr, cfg)
            n_det += sum(len(v["scores"]) for v in out.values())
            t5 = time.perf_counter()
            rec["readback_s"].append(t4 - t3)
            rec["assemble_s"].append(t5 - t4)
            elapsed = time.perf_counter() - t_sweep0
            return elapsed, n_det
        finally:
            pool.shutdown(wait=True)

    # ---- warm-up: compile every program at this operating point ----------
    t0 = time.perf_counter()
    fe0 = prefetch_work(files[0])
    packed0 = pipeline.detect_file_packed(params, cfg, fe0, args.min_score,
                                          args.batch)
    _ = pipeline.packed_to_class_dict(np.asarray(packed0), cfg)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    for k in rec:
        rec[k].clear()

    # ---- baseline A: detector-only program rate (staged fe_res) ----------
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        pk = pipeline.detect_file_packed(params, cfg, fe0, args.min_score,
                                         args.batch)
        _ = np.asarray(pk)
    det_only_s = (time.perf_counter() - t0) / reps

    # ---- baseline B: transfer-only (same payload bytes as the sweep) -----
    pa = wirecodec.encode(files[0])
    wire_mb = pa.wire_bytes / 1e6
    buf = np.ascontiguousarray(pa.payload)
    _ = float(jnp.asarray(buf.copy()).astype(jnp.int32).sum())  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(jnp.asarray(buf.copy()).astype(jnp.int32).sum())
    xfer_only_s = (time.perf_counter() - t0) / reps

    # ---- instrumented sweeps ---------------------------------------------
    sweeps = []
    for r in range(args.reps):
        elapsed, n_det = instrumented_sweep()
        sweeps.append(elapsed)
        print(f"sweep {r}: {elapsed:.2f}s "
              f"({args.files * args.seconds / elapsed:.1f}x RT), "
              f"{n_det} detections", flush=True)

    def stats(xs):
        xs = np.asarray(xs, np.float64)
        return {"mean": round(float(xs.mean()), 4),
                "p50": round(float(np.median(xs)), 4),
                "max": round(float(xs.max()), 4)} if xs.size else {}

    out = {
        "device": str(jax.devices()[0]),
        "files": args.files,
        "seconds": args.seconds,
        "prefetch_workers": args.prefetch_workers,
        "sweep_elapsed_s": [round(s, 2) for s in sweeps],
        "per_file_wall_s": round(min(sweeps) / args.files, 3),
        "detector_only_per_file_s": round(det_only_s, 3),
        "transfer_only_per_file_s": round(xfer_only_s, 3),
        "wire_mb_per_file": round(wire_mb, 1),
        "phases": {k: stats(v) for k, v in rec.items()},
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
